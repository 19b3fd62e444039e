#!/usr/bin/env python
"""spark-submit entry point (the reference's ``panorama.py`` niche).

    zip -r panorama_elt_spark.zip panorama_elt_spark
    spark-submit --py-files panorama_elt_spark.zip panorama.py replay \
        --root /lake/repos --log /wal/events --batch-size 1000000

Also runnable directly: ``python panorama.py <cmd> ...``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from panorama_elt_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
