"""Deterministic sampling and mixture weighting for training corpora.

A training-data pipeline rarely trains on its corpus as-is: sources are
re-weighted (books up, raw web down), and ablations need reproducible
subsamples. Extends the reference's dataflow scope the same way the dedup
family does (north-star scope; reference surface at Demo1.java:33-107 has
no sampling — confirmed absence, SURVEY §2.6).

Spark's `DataFrame.sample` draws from `rand()`, which is seeded per task
ATTEMPT: a retried or re-planned task can produce a different sample, so
two runs over 100 TB (or one run with a lost executor) yield different
corpora. Everything here instead derives the keep/drop decision from a
portable content hash (`functions.hashing`):

- bit-identical across runs, task retries, partitionings, AND engines
  (the DuckDB oracle reproduces every decision exactly);
- a row's fate depends only on (salt, key) — upstream operators can be
  reordered or re-partitioned freely;
- per-salt decisions are independent: nested samples (a 10% eval slice of
  a 50% ablation) compose without correlation artifacts.

Scale design: every operator is map-only — a scan-stage projection +
filter (or a row-local explode for integer upweights). No shuffle, no
state, no skew surface; AQE and pushdown behave exactly as for any
narrow transformation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

# Hash-bucket resolution. 2^20 buckets give fraction granularity ~1e-6
# while keeping threshold arithmetic exact in int64 on both engines.
BUCKETS = 1 << 20


def _bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, BUCKETS) from (salt, key) — decision column
    shared by every sampler here.

    NULL keys hash as the empty string ON BOTH ENGINES (NULL and ''
    deliberately collide): without the coalesce, Spark's concat_ws skips
    the NULL ("salt") while DuckDB's concat skips only the value
    ("salt:"), so the engines hash DIFFERENT strings and the
    bit-identical-decision contract breaks exactly on the rows hardest
    to debug."""
    return (
        portable_hash64(
            F.concat_ws(
                ":", F.lit(salt), F.coalesce(key.cast("string"), F.lit(""))
            )
        )
        % BUCKETS
    )


def bucket_sql(key_expr: str, salt: str) -> str:
    """The identical bucket in DuckDB SQL (oracle side) — NULL keys
    coalesce to '' exactly like `_bucket`."""
    h = portable_hash64_sql(
        f"concat('{salt}', ':', COALESCE(CAST({key_expr} AS VARCHAR), ''))"
    )
    return f"({h} % {BUCKETS})"


def threshold(fraction: float) -> int:
    """Integer keep-threshold for a fraction (same rounding both engines)."""
    return int(round(fraction * BUCKETS))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic `fraction` of rows, decided by hash(salt, key).

    Rows whose bucket falls below `threshold(fraction)` survive. The same
    (salt, key) always makes the same decision, so the sample is stable
    under retries and reproducible months later from the salt alone.
    Distinct salts give independent samples of the same corpus.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(F.col(key_col), salt) < threshold(fraction))


def stratified_mix(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Re-weight strata into a training mixture, deterministically.

    `weights` maps stratum value -> target multiplier:
    - w < 1  : downsample the stratum to that fraction (hash-decided);
    - w >= 1 : keep every row floor(w) times and hash-sample the
      fractional remainder — output rows carry an `epoch` column
      (0..copies-1) so downstream shuffling/packing can spread repeats.
    Strata absent from `weights` are dropped (explicit mixture spec).

    Row-local algebra: for weight w, key survives to epoch e iff
    e < floor(w), plus one extra epoch when its bucket clears the
    fractional threshold — so expected output size is w x stratum size
    and two runs agree row-for-row. Upweighting explodes a literal
    sequence (no join); downweighting is a filter. Both stay inside the
    scan stage.
    """
    if not weights:
        raise ValueError("weights must name at least one stratum")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative, got {weights}")

    bucket = _bucket(F.col(key_col), salt)
    # Whole copies per stratum: floor(w), +1 when the fractional part's
    # hash-threshold admits this key.
    whole = F.lit(None).cast("int")
    frac_hit = F.lit(None).cast("boolean")
    for stratum, w in weights.items():
        n_whole = int(w)
        t = threshold(w - n_whole)
        whole = F.when(F.col(stratum_col) == stratum, F.lit(n_whole)).otherwise(whole)
        frac_hit = F.when(
            F.col(stratum_col) == stratum, bucket < F.lit(t)
        ).otherwise(frac_hit)

    copies = whole + F.when(frac_hit, 1).otherwise(0)
    # Working column dodges caller columns (withColumn silently
    # overwrites — same guard as top_k_per_group/salted_agg); 'epoch' is
    # the documented OUTPUT column and intentionally replaces any input
    # column of that name.
    cc = "_copies"
    while cc in df.columns:
        cc = f"_{cc}"
    return (
        df.withColumn(cc, copies)
        .filter(F.col(cc) > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col(cc) - 1)))
        .drop(cc)
    )


def stratified_mix_sql(
    table: str,
    weights: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    columns: str = "*",
) -> str:
    """DuckDB oracle for `stratified_mix` (identical rows + epoch)."""
    bucket = bucket_sql(key_col, salt)
    whole_cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {int(w)}" for s, w in weights.items()
    )
    frac_cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN "
        f"(CASE WHEN {bucket} < {threshold(w - int(w))} THEN 1 ELSE 0 END)"
        for s, w in weights.items()
    )
    # The outer select re-lists the payload via EXCLUDE so the _copies
    # helper never leaks — required for the columns="*" default, where a
    # literal re-use of the column list would also emit _copies.
    return f"""
    WITH counted AS (
      SELECT {columns},
             (CASE {whole_cases} END) + (CASE {frac_cases} END) AS _copies
      FROM {table}
      WHERE {stratum_col} IN ({", ".join(f"'{s}'" for s in weights)})
    )
    SELECT c.* EXCLUDE (_copies), CAST(u.epoch AS BIGINT) AS epoch
    FROM counted c, UNNEST(range(_copies)) AS u(epoch)
    WHERE _copies > 0
    """
