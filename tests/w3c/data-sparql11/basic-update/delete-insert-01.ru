PREFIX : <http://example/>
DELETE { ?s :name ?n } INSERT { ?s :label ?n } WHERE { ?s :name ?n }
