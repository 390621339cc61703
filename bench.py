"""Bench harness (driver contract).

Plain run: builds the inverted index over a deterministic synthetic
transcript table sized from ``$GRAFT_SF_DIR``'s scale factor, then
measures single-query p50 latency and actor-pool msearch throughput.
Prints ONE JSON line:

  {"metric": "index-build+query", "value": <headline build seconds>,
   "unit": "sec", "queries": {...}, "sf": .., "num_cpus": N,
   "build_turns_per_sec": ...}

``--scaling``: runs the SAME build job in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input (sandbox proxy for N vs
4N nodes; BASELINE.md) and prints both throughputs + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROOT = "/tmp/retriv_ray_bench"
CONVS_PER_SF = 150_000  # ~6.5 turns/conv -> ~1M turns at sf=1
N_QUERIES = 1000
N_LATENCY_QUERIES = 200
CUTOFF = 100


def sf_of(path: str) -> float:
    base = os.path.basename(os.path.normpath(path))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.1


def bench_queries(n: int, seed: int = 123):
    import numpy as np

    from retriv_ray.sources.transcripts import _VOCAB

    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        k = int(rng.integers(2, 5))
        terms = rng.choice(np.asarray(_VOCAB, dtype=object), size=k, replace=False)
        out.append({"id": f"q{i}", "text": " ".join(terms)})
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from retriv_ray.config import SparseConfig
    from retriv_ray.index.build import build_index
    from retriv_ray.search.searcher import RaySparseRetriever
    from retriv_ray.sources.transcripts import write_transcripts

    sf = sf_of(SF_DIR)
    n_convs = max(200, int(CONVS_PER_SF * sf))
    src = os.path.join(BENCH_ROOT, f"transcripts_sf{sf}")
    if not os.path.isdir(src) or not os.listdir(src):
        os.makedirs(src, exist_ok=True)
        write_transcripts(src, n_convs, seed=42)
    # warm the page cache so both scaling runs measure compute+shuffle
    n_turns = ray.data.read_parquet(src).count()

    index_dir = os.path.join(BENCH_ROOT, f"index_sf{sf}_cpus{NUM_CPUS}")
    t0 = time.monotonic()
    build_index(src, index_dir, SparseConfig(), num_parts=16, resume=False)
    t_build = time.monotonic() - t0

    r = RaySparseRetriever(index_dir)
    qs = bench_queries(N_QUERIES)

    # warm segment caches + p50 single-query latency
    lat = []
    for q in qs[:N_LATENCY_QUERIES]:
        t1 = time.monotonic()
        r.search(q["text"], cutoff=CUTOFF)
        lat.append(time.monotonic() - t1)
    p50_ms = float(np.percentile(np.asarray(lat) * 1000, 50))

    t2 = time.monotonic()
    n_rows = r.msearch_ds(qs, cutoff=CUTOFF).count()
    t_msearch = time.monotonic() - t2

    out = {
        "metric": "index-build+query (turns/sec build, p50 ms, msearch q/s)",
        "value": round(t_build, 3),
        "unit": "sec",
        "queries": {
            "index_build": round(t_build, 3),
            "query_p50_ms": round(p50_ms, 3),
            "msearch_1000q": round(t_msearch, 3),
        },
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_turns": int(n_turns),
        "build_turns_per_sec": round(n_turns / t_build, 1),
        "msearch_qps": round(N_QUERIES / t_msearch, 1),
        "msearch_rows": int(n_rows),
    }
    ray.shutdown()
    print(json.dumps(out))


def scaling() -> None:
    lo_cpus, hi_cpus = 8, 32

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = run(lo_cpus)
    hi = run(hi_cpus)
    eff = (hi["build_turns_per_sec"] / lo["build_turns_per_sec"]) / (hi_cpus / lo_cpus)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (build turns/sec, 8 -> 32 cpus)",
                "value": round(eff, 3),
                "unit": "efficiency",
                "sf": lo["sf"],
                "turns_per_sec_8": lo["build_turns_per_sec"],
                "turns_per_sec_32": hi["build_turns_per_sec"],
                "build_sec_8": lo["queries"]["index_build"],
                "build_sec_32": hi["queries"]["index_build"],
                "msearch_qps_8": lo["msearch_qps"],
                "msearch_qps_32": hi["msearch_qps"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
