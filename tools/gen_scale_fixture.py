"""Generate an N×-scaled documents/embeddings fixture for scale-stress runs.

The sf0.1 fixtures verify CORRECTNESS; the 100 TB claims rest on
plan-shape arguments that only an empirical scale sweep can check
(VERDICT r3 item 1). This tool replicates the base fixture `mult` times
with replica-local structure:

- documents: every replica is a BIJECTIVE token rename of the base
  corpus (each `[a-z0-9]+` token gets a replica suffix, which the
  tokenizer keeps as one token). Within a replica, the near-dup pair
  structure is therefore EXACTLY the base corpus's; across replicas,
  token sets are disjoint, so no shingle ever collides. Total candidate
  pairs, near-dup pairs, and cluster counts scale exactly linearly by
  construction — which is precisely what makes wall-time ratios
  interpretable (any superlinear growth is the PLAN's fault, not the
  data's).
- embeddings: every replica is a cyclic DIMENSION rotation of the base
  vectors (norms and within-replica geometry preserved bit-for-bit;
  cross-replica similarities decorrelate). IVF centroid counts
  (every-Nth) and SRP bucket populations scale linearly.

Ids offset by replica * 10_000_000 — far above any base id, and
divisible by common probe moduli so base-replica probe predicates stay
stable.

Output goes under the repo (gitignored), never into /root/testdata.

Usage: python tools/gen_scale_fixture.py [--mult 10]
       [--src /root/testdata/sf0.1] [--dest .scaledata/sf1]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPLICA_OFFSET = 10_000_000
_TOKEN_RUN = re.compile(r"[A-Za-z0-9]+")


def scale_documents(src: str, dest: str, mult: int) -> int:
    tbl = pq.read_table(f"{src}/documents.parquet")
    pdf = tbl.to_pandas()
    frames = []
    for r in range(mult):
        rep = pdf.copy()
        rep["doc_id"] = rep["doc_id"] + r * REPLICA_OFFSET
        if r > 0:
            suffix = f"zz{r}"
            rep["text"] = rep["text"].map(
                lambda t, s=suffix: None
                if t is None
                else _TOKEN_RUN.sub(lambda m: m.group(0) + s, t)
            )
            rep["n_chars"] = rep["text"].map(
                lambda t: 0 if t is None else len(t)
            )
        frames.append(rep)
    import pandas as pd

    out = pd.concat(frames, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        f"{dest}/documents.parquet",
    )
    return len(out)


def scale_events(src: str, dest: str, mult: int) -> int:
    """Replica-disjoint KEY spaces over an identical time axis: replica r
    offsets event_id and user_id by r*REPLICA_OFFSET and keeps ts /
    event_type / value / props unchanged. Every replica therefore has
    exactly the base fixture's per-key window structure, and the total
    streaming state (per-key aggregation rows, join state) grows exactly
    linearly in the key count — any superlinear wall growth or
    state-store blowup in a drain over this fixture is the OPERATOR's
    fault, not the data's."""
    tbl = pq.read_table(f"{src}/events.parquet")
    pdf = tbl.to_pandas()
    import pandas as pd

    frames = []
    for r in range(mult):
        rep = pdf.copy()
        rep["event_id"] = rep["event_id"] + r * REPLICA_OFFSET
        rep["user_id"] = rep["user_id"] + r * REPLICA_OFFSET
        frames.append(rep)
    out = pd.concat(frames, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        f"{dest}/events.parquet",
    )
    return len(out)


def scale_embeddings(src: str, dest: str, mult: int) -> int:
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    pdf = tbl.to_pandas()
    base = np.array([list(v) for v in pdf["embedding"]], dtype=np.float32)
    dim = base.shape[1]
    import pandas as pd

    frames = []
    for r in range(mult):
        rep = pdf.copy()
        rep["vec_id"] = rep["vec_id"] + r * REPLICA_OFFSET
        if r > 0:
            rot = np.roll(base, shift=(r * 7) % dim, axis=1)
            rep["embedding"] = [row.tolist() for row in rot]
        frames.append(rep)
    out = pd.concat(frames, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        f"{dest}/embeddings.parquet",
    )
    return len(out)


def generate(src: str, dest: str, mult: int) -> dict:
    os.makedirs(dest, exist_ok=True)
    n_docs = scale_documents(src, dest, mult)
    n_vecs = scale_embeddings(src, dest, mult)
    n_events = scale_events(src, dest, mult)
    return {
        "dest": dest,
        "mult": mult,
        "documents": n_docs,
        "embeddings": n_vecs,
        "events": n_events,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dest",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata",
            "sf1",
        ),
    )
    args = ap.parse_args()
    info = generate(args.src, args.dest, args.mult)
    print(info)


if __name__ == "__main__":
    sys.exit(main())
