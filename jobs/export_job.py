"""spark-submit entrypoint for the multi-format serialization sinks.

Usage (local sandbox):
    ./build_pyfiles.sh
    spark-submit --master 'local[8]' --py-files dist/pyobo_spark.zip \\
        jobs/export_job.py --out /tmp/export_out [--n-terms 200] \\
        [--formats obo,skos,obograph,ofn,obonet]

Writes one directory per format, each produced by the distributed
(write.text / JSON-lines) path — no driver materialization at any
ontology size. The per-format row counts print as a JSON lineage line,
mirroring db_output_helper's summary counters.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-terms", type=int, default=200)
    ap.add_argument(
        "--formats", default="obo,skos,obograph,ofn,obonet"
    )
    args = ap.parse_args()
    formats = {f.strip() for f in args.formats.split(",") if f.strip()}

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("export_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pyobo_spark.fixtures import generator
    from pyobo_spark.operators import (
        obo_writer,
        obonet_export,
        ofn_writer,
        rdf_writers,
    )

    t = generator.to_spark(
        spark, generator.generate(n_terms=args.n_terms, n_docs=1)
    )
    prefix = "fixo"
    counters: dict[str, int] = {}

    # counters come from cached plans or sink read-backs — each format's
    # pipeline executes once, not once-per-write-plus-once-per-count
    if "obo" in formats:
        stanzas = obo_writer.obo_stanzas(
            t["terms"], t["synonyms"], t["xrefs"], t["relations"],
            t["parents"], t["alts"], prefix=prefix,
        ).persist()
        obo_writer.write_obo_document(
            stanzas, f"{args.out}/obo", prefix, "1"
        )
        counters["obo_stanzas"] = stanzas.count()
        stanzas.unpersist()
    if "skos" in formats:
        rdf_writers.write_skos(
            t["terms"], t["synonyms"], t["parents"], prefix,
            f"{args.out}/skos",
        )
        # one N-Triples line per triple → the sink IS the counter
        counters["skos_triples"] = spark.read.text(
            f"{args.out}/skos"
        ).count()
    if "obograph" in formats:
        rdf_writers.write_obograph_jsonl(
            t["terms"], t["parents"], t["relations"], prefix,
            f"{args.out}/obograph",
        )
        counters["obograph_records"] = spark.read.text(
            f"{args.out}/obograph"
        ).count()
    if "ofn" in formats:
        ax = ofn_writer.ofn_axioms(
            t["terms"], t["synonyms"], t["xrefs"], t["relations"],
            t["parents"], t["alts"], prefix,
        ).persist()
        counters["ofn_axioms"] = ax.count()
        ofn_writer.write_ofn(
            t["terms"], t["synonyms"], t["xrefs"], t["relations"],
            t["parents"], t["alts"], prefix, f"{args.out}/ofn",
            version="1", axioms=ax,
        )
        ax.unpersist()
    if "obonet" in formats:
        nodes = obonet_export.obonet_nodes(
            t["terms"], t["synonyms"], t["xrefs"], t["relations"],
            t["parents"], prefix,
        ).persist()
        nodes.select("node_json").write.mode("overwrite").text(
            f"{args.out}/obonet_nodes"
        )
        counters["obonet_nodes"] = nodes.count()
        nodes.unpersist()
        links = obonet_export.obonet_links(
            t["relations"], t["parents"], prefix
        ).persist()
        links.write.mode("overwrite").parquet(f"{args.out}/obonet_links")
        counters["obonet_links"] = links.count()
        links.unpersist()

    print(json.dumps({"job": "export", "counters": counters}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
