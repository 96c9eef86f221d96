PREFIX : <http://example/>
INSERT { ?y :knownBy ?x } WHERE { ?x :knows ?y }
