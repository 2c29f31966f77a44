"""``python -m netascore_spark run settings.yml`` — see cli.py."""

from netascore_spark.cli import main

raise SystemExit(main())
