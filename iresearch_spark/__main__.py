import sys

from iresearch_spark.cli import main

sys.exit(main())
