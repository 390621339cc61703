"""Index-build job entry point for ``ray job submit``.

    ray job submit --working-dir . -- \
        python scripts/submit_build.py INPUT_PARQUET_DIR INDEX_DIR \
            [--num-parts N] [--shard-docs N] [--no-resume] \
            [--model bm25|tf-idf] [--b B] [--k1 K1] [--min-df N]

Attaches to the cluster the job runner provides (RAY_ADDRESS); falls
back to a local session when run standalone. The build is resumable:
re-submitting the same job skips completed (shard, part) groups via
their lineage records (see retriv_ray/index/manifest.py), so a
preempted job continues mid-shuffle.

Prints one JSON line with the manifest summary on success.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="transcript parquet dir/file")
    ap.add_argument("index_dir")
    ap.add_argument("--num-parts", type=int, default=None)
    ap.add_argument("--shard-docs", type=int, default=1 << 22)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--model", default="bm25")
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--min-df", type=int, default=1)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)  # honors RAY_ADDRESS
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from retriv_ray.config import SparseConfig
    from retriv_ray.index.build import build_index

    cfg = SparseConfig(
        model=args.model,
        min_df=args.min_df,
        hyperparams=dict(b=args.b, k1=args.k1),
    )
    t0 = time.monotonic()
    man = build_index(
        args.input,
        args.index_dir,
        cfg,
        num_parts=args.num_parts,
        shard_docs=args.shard_docs,
        resume=not args.no_resume,
    )
    print(
        json.dumps(
            {
                "index_dir": args.index_dir,
                "doc_count": man.doc_count,
                "n_terms": man.n_terms,
                "n_postings": man.n_postings,
                "num_parts": man.num_parts,
                "seconds": round(time.monotonic() - t0, 3),
                "turns_per_sec": round(
                    man.doc_count / max(time.monotonic() - t0, 1e-9), 1
                ),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
