PREFIX : <http://example/>
INSERT DATA { GRAPH <g1.ttl> { :g1s :q :new } }
