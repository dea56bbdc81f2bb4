"""Read-only HTTP status API (jobs/status_server.py — the served slice of
the reference's REST controller, Mysql2MysqlController.scala:23-89):
every route answers from table metadata on disk, no Spark session in the
server, torn-free JSON documents."""

import json
import os
import threading
import urllib.request

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.multi import run_sync_multi

from jobs.status_server import make_server


def _get(port: int, path: str):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, json.loads(r.read())


def _get_status(port: int, path: str):
    try:
        return _get(port, path)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_status_server_routes(spark, tmpdir_path):
    # build two destination tables via a real multi-table sync
    rows = [
        (1, "insert", "db1.a", "c1", 0, "a1"),
        (2, "insert", "db1.b", "k1", 0, "b1"),
        (3, "update", "db1.a", "c1", 0, "a1-v2"),
    ]
    df = spark.createDataFrame(rows, ["lsn", "op", "src_table", "conv_id", "turn_idx", "text"])
    df.write.parquet(os.path.join(tmpdir_path, "log"))
    cfg = SyncConfig(
        source_log_dir=os.path.join(tmpdir_path, "log"),
        target_table_dir=os.path.join(tmpdir_path, "tables"),
        checkpoint_path=os.path.join(tmpdir_path, "ckpt.json"),
        n_buckets=2,
        envelope_cols=("lsn", "op"),
        table_col="src_table",
    )
    run_sync_multi(spark, cfg, events_per_batch=100)

    srv = make_server(
        cfg.target_table_dir, multi=True, checkpoint_path=cfg.checkpoint_path, port=0
    )
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        code, health = _get(port, "/health")
        assert code == 200 and health["ok"]

        code, tables = _get(port, "/tables")
        assert code == 200 and set(tables["tables"]) == {"db1.a", "db1.b"}
        assert tables["tables"]["db1.a"]["exists"]

        code, ta = _get(port, "/tables/db1.a")
        assert code == 200
        assert ta["applied_lsn_hi"] == 3
        assert ta["version"] >= 1
        assert ta["last_batch"]["offset_range"] == [0, 3]  # plan starts at lsn 0

        code, ckpt = _get(port, "/checkpoint")
        assert code == 200 and ckpt["next_lsn"] == 4

        code, err = _get_status(port, "/tables/nope")
        assert code == 404 and "unknown table" in err["error"]
        code, _ = _get_status(port, "/bogus")
        assert code == 404
    finally:
        srv.shutdown()
        srv.server_close()
