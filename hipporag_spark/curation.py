"""Corpus-curation operators beyond dedup/textstats: benchmark
decontamination and deterministic stratified sampling — the remaining
standard passes of a large-scale training-data pipeline (alongside
:mod:`.dedup` near-dup removal, :mod:`.textstats` quality/PII gates and
the leakage-safe :func:`.textstats.dataset_split`).

Scale design:

- :func:`decontaminate` — eval/benchmark suites are tiny (MBs) next to a
  100 TB corpus, so the benchmark n-gram set is ``broadcast()`` and the
  corpus side is a map-side hash join over its (already distinct)
  shingles; the only shuffle is the per-doc count aggregation, which is
  map-side combinable.  No corpus row explosion beyond the shingle
  table dedup already builds.
- :func:`stratified_sample` — pure projection + filter (content-
  independent md5 id hash, the same idiom as ``dataset_split``):
  partitioning-invariant, re-run-stable, no shuffle at all.  Rates are
  a plain dict compiled into the plan as a literal map.

Both have exact DuckDB oracles in ``__spark_entry__.py``
(gates ``decontam``, ``strat_sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

__all__ = ["decontaminate", "stratified_sample"]


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Flag corpus documents that share any word ``n``-gram with a
    benchmark/eval set — the standard pre-training decontamination pass
    (e.g. GPT-3 appendix C / PaLM-style 13-gram overlap, here with a
    configurable ``n``).

    Returns one row per corpus doc:
    ``(doc_id, n_grams, n_hits, contam_frac, contaminated)`` where
    ``n_hits`` counts the doc's distinct n-grams that appear anywhere in
    the benchmark and ``contam_frac = n_hits / n_grams`` (0.0 for docs
    too short to form an n-gram).

    Both sides are shingled with the dedup normalization, so punctuation
    and case differences don't hide overlap.
    """
    bench_grams = (
        shingles(benchmark, n=n, text_col=bench_text_col or text_col)
        .select("shingle")
        .distinct()
    )
    # eval suites are tiny next to the corpus, so broadcast is the normal
    # path; an outsized benchmark falls back to a shuffle join instead of
    # risking the driver.  The size guard recomputes the (tiny) distinct
    # plan rather than persist()-ing it — a persisted handle could never
    # be released after return and would pin executor storage per call
    small = bench_grams.count() <= 5_000_000
    bg = F.broadcast(bench_grams) if small else bench_grams
    doc_grams = shingles(docs, n=n, text_col=text_col)
    sizes = doc_grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        doc_grams.join(bg, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.coalesce("n_hits", F.lit(0)).cast("double") / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("contam_frac"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the data-mixing
    primitive (e.g. upweight curated sources, downweight web crawl).

    A row is kept iff ``u < rates[stratum]`` where
    ``u = (first 8 md5 hex chars of "id:seed") / 2^32`` — the same
    content-independent hash idiom as :func:`.textstats.dataset_split`,
    so the sample is identical on every run, cluster size and
    partitioning, and adding rows never flips old decisions.  Strata
    missing from ``rates`` default to rate 0.0 (dropped).  Unlike
    ``DataFrame.sample``, which is seed-and-partitioning dependent, this
    is reproducible row-level provenance: the keep decision is a pure
    function of (id, seed, stratum rate).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        / F.lit(float(1 << 32))
    )
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    rate = F.coalesce(
        rate_map[F.col(strata_col).cast("string")], F.lit(0.0)
    )
    return df.where(u < rate)
