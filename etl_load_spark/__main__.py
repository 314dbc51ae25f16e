from etl_load_spark.cli import main

raise SystemExit(main())
