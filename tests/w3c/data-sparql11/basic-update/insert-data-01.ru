PREFIX : <http://example/>
INSERT DATA { :b :knows :c }
