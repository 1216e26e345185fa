"""CLI entry point — ``python -m feast_spark <command>``.

Upstream provenance: feast/cli.py (the ``feast`` command). The four
workflows a store operator runs outside a notebook:

- ``apply <defs.py> --root R`` — execute a feature-definition module
  (the user's own code, upstream's exact trust model: ``feast apply``
  imports your repo) and register every FeatureView / OnDemandFeatureView
  / FeatureService / Entity-bearing object found at module scope into
  the JSON registry at R.
- ``materialize <view> <start> <end> --root R --dest D`` (and
  ``materialize-incremental <view> <end>``) — run the batch
  materialization job into the online store at D.
- ``serve --root R --store view=path ... [--host H --port P]`` — the
  HTTP feature server (server.py) over materialized stores.
- ``registry-dump --root R`` — print the registry JSON (upstream
  ``feast registry-dump``), the inspection/debugging surface.

Scale note: the CLI is a driver-process wrapper; every command
delegates to the same library paths the tests pin (MaterializeJob,
FeatureServer), so cluster submission is ``spark-submit --py-files
feast_spark.zip -m feast_spark ...`` with the session built by
``session.get_spark`` (BENCH/run.sh shows the pattern).
"""
from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="feast_spark", description="feature-store operations"
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    ap = sub.add_parser("apply", help="register definitions from a python file")
    ap.add_argument("defs", help="path to a feature-definitions .py file")
    ap.add_argument("--root", required=True, help="registry/store root")

    mp = sub.add_parser("materialize", help="batch-materialize a view")
    mp.add_argument("view")
    mp.add_argument("start")
    mp.add_argument("end")
    mp.add_argument("--root", required=True)
    mp.add_argument("--dest", required=True)
    mp.add_argument("--buckets", type=int, default=64)

    mi = sub.add_parser(
        "materialize-incremental",
        help="resume materialization from the store's last end",
    )
    mi.add_argument("view")
    mi.add_argument("end")
    mi.add_argument("--root", required=True)
    mi.add_argument("--dest", required=True)
    mi.add_argument("--start-default", default=None)

    sp = sub.add_parser("serve", help="start the HTTP feature server")
    sp.add_argument("--root", required=True)
    sp.add_argument(
        "--store",
        action="append",
        default=[],
        metavar="VIEW=PATH",
        help="online store mapping (repeatable)",
    )
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=6566)  # upstream's default

    rd = sub.add_parser("registry-dump", help="print the registry JSON")
    rd.add_argument("--root", required=True)
    return p


def _exec_defs(path: str) -> list:
    """Execute a definitions file and collect registrable objects at
    module scope — upstream ``feast apply`` semantics (it imports the
    user's own repo; same trust model, the file is the user's code)."""
    import runpy

    from feast_spark.registry import (
        FeatureService, FeatureView, OnDemandFeatureView,
    )

    ns = runpy.run_path(path)
    objs = [
        v
        for v in ns.values()
        if isinstance(v, (FeatureView, OnDemandFeatureView, FeatureService))
    ]
    if not objs:
        raise SystemExit(f"no feature definitions found in {path}")
    return objs


def main(argv: list[str] | None = None, spark=None, block: bool = True):
    """Returns the started FeatureServer for ``serve`` when
    ``block=False`` (test hook); otherwise serves forever / returns the
    command's summary dict."""
    args = _build_parser().parse_args(argv)

    if args.cmd == "registry-dump":  # no Spark session needed
        import os

        reg = os.path.join(args.root, "registry.json")
        with open(reg) as f:
            print(json.dumps(json.load(f), indent=2, sort_keys=True))
        return None

    if spark is None:
        from feast_spark.session import get_spark

        spark = get_spark("feast_spark_cli")
    from feast_spark.registry import FeatureStore

    store = FeatureStore(spark, root=args.root)

    if args.cmd == "apply":
        objs = _exec_defs(args.defs)
        store.apply(objs)
        names = sorted(
            getattr(o, "name", "?") for o in objs
        )
        print(f"applied {len(objs)} object(s): {', '.join(names)}")
        return {"applied": names}

    if args.cmd == "materialize":
        summary = store.materialize(
            args.view, args.start, args.end, args.dest, n_buckets=args.buckets
        )
        print(json.dumps(summary, default=str))
        return summary

    if args.cmd == "materialize-incremental":
        summary = store.materialize_incremental(
            args.view, args.end, args.dest, start_default=args.start_default
        )
        print(json.dumps(summary, default=str))
        return summary

    if args.cmd == "serve":
        from feast_spark.server import FeatureServer

        stores = {}
        for item in args.store:
            view, _, path = item.partition("=")
            if not view or not path:
                raise SystemExit(f"--store expects VIEW=PATH, got {item!r}")
            stores[view] = path
        srv = FeatureServer(store, stores, host=args.host, port=args.port)
        print(f"serving on http://{srv.host}:{srv.port}", file=sys.stderr)
        if not block:
            return srv.start()
        srv.serve_forever()
    return None


if __name__ == "__main__":
    main()
