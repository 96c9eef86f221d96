from rdfproject_msc_spark.cli import main

raise SystemExit(main())
