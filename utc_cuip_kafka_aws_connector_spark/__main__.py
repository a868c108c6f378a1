from utc_cuip_kafka_aws_connector_spark.cli import main

raise SystemExit(main())
