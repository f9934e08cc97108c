"""Materialize the seeded fixtures (FIXTURES.md) as parquet under
fixtures_data/ — pure generator, same seed → identical bytes.

Usage: python scripts/make_fixtures.py [out_dir] [n_terms] [n_docs]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyobo_spark.fixtures import generator
from pyobo_spark.session import get_spark


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures_data"
    n_terms = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    spark = get_spark("make_fixtures", cores=8, shuffle_partitions=8)
    tables = generator.to_spark(spark, generator.generate(n_terms, n_docs))
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"wrote {out}/{name}.parquet")


if __name__ == "__main__":
    main()
