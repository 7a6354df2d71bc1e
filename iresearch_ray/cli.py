"""CLI entry points — the ``index-put`` / ``index-search`` /
``index-dump`` analogues (reference ``utils/index-put.cpp``,
``index-search.cpp``, ``index-dump.cpp``).

    python -m iresearch_ray.cli put --input DIR --index DIR \
        [--analyzer segmentation] [--segment-docs N] [--exact-fields a,b]
    python -m iresearch_ray.cli search --index DIR --query "..." \
        [--k 100] [--scorer bm25|tfidf] [--mode strict|all] [--repeat N]
    python -m iresearch_ray.cli dump --index DIR [--term T] [--field F]
    python -m iresearch_ray.cli consolidate --index DIR

These own their Ray session (guarded init / shutdown); the library
itself never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    return ray


def cmd_put(args) -> None:
    ray = _ensure_ray()
    from iresearch_ray.index.build import build_index

    t0 = time.time()
    man = build_index(
        args.input,
        args.index,
        analyzer=args.analyzer,
        analyzer_options=json.loads(args.analyzer_options),
        segment_docs=args.segment_docs,
        text_col=args.text_col,
        key_cols=tuple(args.key_cols.split(",")),
        exact_fields=tuple(f for f in args.exact_fields.split(",") if f),
        sort=args.sort,
    )
    el = time.time() - t0
    print(json.dumps({
        "docs": man.total_docs, "segments": len(man.segments),
        "generation": man.generation, "sec": round(el, 2),
        "docs_per_sec": round(man.total_docs / el, 1) if el else None,
    }))
    ray.shutdown()


def cmd_search(args) -> None:
    from iresearch_ray.search.parser import parse_query
    from iresearch_ray.search.querystring import parse_query_string
    from iresearch_ray.search.searcher import IndexSearcher

    s = IndexSearcher(args.index,
                      query_threads=getattr(args, "query_threads", 1))
    # lucene syntax resolves each field's registered analyzer from the
    # open index (reference utils/index-search.cpp:680-683)
    flt = (parse_query_string(args.query, searcher=s)
           if getattr(args, "syntax", "simple") == "lucene"
           else parse_query(args.query))
    times = []
    res = None
    for _ in range(args.repeat):
        t0 = time.time()
        res = s.search(flt, k=args.k, scorer=args.scorer, mode=args.mode)
        times.append(time.time() - t0)
    # CSV like the reference per-task output: hits + msec
    sys.stdout.write(f"# query={args.query!r} hits={len(res)} "
                     f"msec={min(times) * 1000:.2f}\n")
    sys.stdout.write("rank,doc_id,score\n")
    for i, row in res.iterrows():
        sys.stdout.write(f"{i},{int(row.doc_id)},{row.score:.6f}\n")


def cmd_dump(args) -> None:
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import SegmentReader

    man = Manifest.load(args.index)
    print(json.dumps({"generation": man.generation,
                      "total_docs": man.total_docs,
                      "segments": len(man.segments)}))
    import os

    for meta in man.segments:
        seg = SegmentReader(os.path.join(args.index, meta["name"]), meta=meta)
        if args.term is None:
            print(json.dumps({
                "segment": meta["name"], "docs": seg.docs_count,
                "live_docs": seg.live_docs_count,
                "fields": {f: v["row_end"] - v["row_start"]
                           for f, v in seg.fields.items()},
                "lineage": meta.get("lineage", {}),
            }))
        else:
            row = seg.lookup(args.term, args.field)
            if row < 0:
                print(f"{meta['name']}: term not found")
                continue
            pl = seg.postings(row, positions=args.positions)
            out = {"segment": meta["name"], "doc_freq": int(seg.doc_freq[row]),
                   "total_tf": int(seg.total_tf[row]),
                   "docs": pl.docs[:args.limit].tolist(),
                   "tfs": pl.tfs[:args.limit].tolist()}
            if args.positions:
                out["positions"] = [
                    pl.positions_for(i).tolist()
                    for i in range(min(args.limit, pl.docs.size))
                ]
            print(json.dumps(out))


def cmd_convert(args) -> None:
    from iresearch_ray.index.merge import convert_index

    man = convert_index(args.index, args.out)
    print(json.dumps({"segments": len(man.segments),
                      "total_docs": man.total_docs, "out": args.out}))


def cmd_consolidate(args) -> None:
    ray = _ensure_ray()
    from iresearch_ray.index.merge import consolidate

    man = consolidate(args.index, max_segments=args.max_segments)
    print(json.dumps({"generation": man.generation,
                      "segments": len(man.segments)}))
    ray.shutdown()


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="iresearch_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    put = sub.add_parser("put", help="build an index from parquet input")
    put.add_argument("--input", required=True)
    put.add_argument("--index", required=True)
    put.add_argument("--analyzer", default="segmentation")
    put.add_argument("--analyzer-options", default="{}")
    put.add_argument("--segment-docs", type=int, default=65536)
    put.add_argument("--text-col", default="text")
    put.add_argument("--key-cols", default="conv_id,turn_idx")
    put.add_argument("--exact-fields", default="")
    put.add_argument("--sort", action="store_true")
    put.set_defaults(fn=cmd_put)

    se = sub.add_parser("search", help="run one query")
    se.add_argument("--index", required=True)
    se.add_argument("--query", required=True)
    se.add_argument("--k", type=int, default=100)
    se.add_argument("--scorer", default="bm25", choices=["bm25", "tfidf"])
    se.add_argument("--mode", default="strict", choices=["strict", "all"])
    se.add_argument("--syntax", default="simple",
                    choices=["simple", "lucene"],
                    help="query syntax: 'simple' (legacy terms/+/-/"
                         "phrase) or 'lucene' (full query_string: "
                         "AND/OR/NOT, field:, ranges, fuzzy, boosts)")
    se.add_argument("--repeat", type=int, default=1)
    se.add_argument("--query-threads", type=int, default=1,
                    help="per-query segment parallelism (set >1 only "
                         "for few-big-segment consolidated layouts, "
                         "where each per-segment task is one long "
                         "GIL-releasing decode; small segments measure "
                         "faster single-threaded)")
    se.set_defaults(fn=cmd_search)

    du = sub.add_parser("dump", help="dump manifest / posting lists")
    du.add_argument("--index", required=True)
    du.add_argument("--term")
    du.add_argument("--field")
    du.add_argument("--positions", action="store_true")
    du.add_argument("--limit", type=int, default=20)
    du.set_defaults(fn=cmd_dump)

    cv = sub.add_parser("convert", help="re-encode an index through the current format")
    cv.add_argument("--index", required=True)
    cv.add_argument("--out", required=True)
    cv.set_defaults(fn=cmd_convert)

    co = sub.add_parser("consolidate", help="merge segments (tier policy)")
    co.add_argument("--index", required=True)
    co.add_argument("--max-segments", type=int, default=10)
    co.set_defaults(fn=cmd_consolidate)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
