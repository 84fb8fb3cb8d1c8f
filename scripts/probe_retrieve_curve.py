"""One-off probe: the headline `retrieve` query's warm-up curve.

Round-5 records show retrieve sweeps like [15.2, 9.2, 7.8] — sweep 2 is
still ~1.5 s above steady state, so a median-of-3 lands on the
half-warm value.  This runs the identical bench query N times in one
session and prints each wall, to see where steady state actually sits
(and to validate the burn-in-discard policy added to headline_medians).

Usage: python scripts/probe_retrieve_curve.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HIPPORAG_DRIVER_MEM", "48g")

from pyspark.sql import functions as F

from hipporag_spark.session import get_spark
from hipporag_spark.corpus import corpus_from_documents
from hipporag_spark.extract import extract_all
from hipporag_spark.graph import build_graph
from hipporag_spark.retrieve import GraphRetriever, RetrievalConfig

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def main():
    spark = get_spark("probe-retrieve", cores=32)
    t0 = time.time()
    corpus = corpus_from_documents(spark, SF_DIR)
    tables = extract_all(corpus)
    nodes, edges = build_graph(tables)
    edges = edges.persist()
    edges.count()
    print(f"graph_build {time.time() - t0:.2f}s", flush=True)

    walls = []
    for i in range(REPS):
        t0 = time.time()
        r = GraphRetriever(
            spark, nodes, edges, tables["chunks"], tables["entities"],
            tables["facts"], tables["membership"],
            config=RetrievalConfig(retrieval_top_k=10),
        )
        queries = spark.createDataFrame(
            [("q0", "table row key"), ("q1", "merge join scan"),
             ("q2", "vector window batch")],
            "query_id string, question string",
        )
        r.retrieve(queries).count()
        w = round(time.time() - t0, 3)
        walls.append(w)
        print(f"retrieve[{i}] {w}s", flush=True)
    print("walls:", walls)
    spark.stop()


if __name__ == "__main__":
    main()
