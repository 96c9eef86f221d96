PREFIX : <http://example/>
DELETE DATA { :a :name "Alice" }
