"""CLI (`python -m feast_spark`) — upstream feast/cli.py workflows:
apply from a definitions file, materialize, serve, registry-dump.
In-process invocation via main(argv, spark=...) so one Spark session
covers all commands; the module is still executable standalone."""
from __future__ import annotations

import json
import urllib.request
from datetime import datetime

import pytest
from pyspark.sql import Row

from feast_spark.__main__ import main


@pytest.fixture()
def defs_file(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            Row(user="a", ts=datetime(2024, 1, 1), x=1.0),
            Row(user="a", ts=datetime(2024, 1, 9), x=3.0),
            Row(user="b", ts=datetime(2024, 1, 2), x=2.0),
        ]
    ).write.parquet(src)
    defs = tmp_path / "defs.py"
    defs.write_text(
        "from feast_spark import Entity, FeatureSpec, FeatureView\n"
        f"scores = FeatureView(name='scores', entity=Entity('user', 'user'),\n"
        f"    source={src!r}, features=[FeatureSpec('x', 'double')],\n"
        "    timestamp_field='ts')\n"
    )
    return str(defs)


def test_apply_materialize_dump_serve(spark, tmp_path, defs_file, capsys):
    root = str(tmp_path / "root")
    out = main(["apply", defs_file, "--root", root], spark=spark)
    assert out == {"applied": ["scores"]}

    dest = str(tmp_path / "store")
    summary = main(
        [
            "materialize", "scores", "2024-01-01", "2024-02-01",
            "--root", root, "--dest", dest, "--buckets", "4",
        ],
        spark=spark,
    )
    assert summary["rows"] == 2  # latest per user

    capsys.readouterr()  # drop apply/materialize prints
    main(["registry-dump", "--root", root], spark=spark)
    dump = json.loads(capsys.readouterr().out)
    assert [v["name"] for v in dump["views"]] == ["scores"]

    srv = main(
        ["serve", "--root", root, "--store", f"scores={dest}", "--port", "0"],
        spark=spark,
        block=False,
    )
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/get-online-features",
            data=json.dumps(
                {"features": ["scores:x"], "entities": {"user": ["a", "b"]}}
            ).encode(),
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert body["results"][1]["values"] == [3.0, 2.0]  # latest per key
    finally:
        srv.stop()


def test_apply_refuses_empty_defs(spark, tmp_path):
    empty = tmp_path / "empty.py"
    empty.write_text("x = 1\n")
    with pytest.raises(SystemExit, match="no feature definitions"):
        main(
            ["apply", str(empty), "--root", str(tmp_path / "r")], spark=spark
        )


def test_serve_rejects_malformed_store_arg(spark, tmp_path):
    root = str(tmp_path / "root2")
    for bad in ("nopath", "=path"):  # r05 review batch 2: empty view too
        with pytest.raises(SystemExit, match="VIEW=PATH"):
            main(
                ["serve", "--root", root, "--store", bad, "--port", "0"],
                spark=spark,
                block=False,
            )
