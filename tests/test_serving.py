"""Serving-layer tests: ClickHouse formats, query cache, HTTP app, Flight
server — the protocol behaviors the SQL oracle can't check (SURVEY §5.2)."""

from __future__ import annotations

import json

import pytest

from quackflight_spark.serving.cache import QueryCache
from quackflight_spark.serving.formats import format_result
from quackflight_spark.serving.namespaces import user_namespace


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    from quackflight_spark.sources.fixtures import register_all

    register_all(spark, sf_dir)


@pytest.fixture(scope="module")
def small_df(spark):
    return spark.sql(
        "SELECT n_nationkey AS k, n_name AS name FROM nation ORDER BY k LIMIT 3"
    )


def test_jsoncompact_envelope(small_df):
    payload, ctype = format_result(small_df, "JSONCompact", elapsed=0.01)
    body = json.loads(payload)
    assert set(body) == {"meta", "data", "rows", "statistics"}
    assert body["meta"] == [
        {"name": "k", "type": "Int32"},
        {"name": "name", "type": "String"},
    ]
    assert body["rows"] == 3
    assert body["data"][0] == [0, "NATION_0"]
    assert ctype == "application/json"


def test_json_row_objects(small_df):
    body = json.loads(format_result(small_df, "JSON")[0])
    assert body["data"][0] == {"k": 0, "name": "NATION_0"}


def test_jsoneachrow(small_df):
    payload, _ = format_result(small_df, "JSONEachRow")
    lines = payload.decode().strip().split("\n")
    assert len(lines) == 3
    assert json.loads(lines[0]) == {"k": 0, "name": "NATION_0"}


def test_tsv_csv(small_df):
    tsv, _ = format_result(small_df, "TSV")
    assert tsv.decode().splitlines()[0] == "k\tname"
    csv_out, _ = format_result(small_df, "CSV")
    assert csv_out.decode().splitlines()[0] == "k,name"


def test_csv_quoting(spark):
    """Deliberate fix of the reference's unquoted CSV (main.py:191)."""
    df = spark.sql("SELECT 'a,b' AS x, 'line\nbreak' AS y")
    out, _ = format_result(df, "CSV")
    assert '"a,b"' in out.decode()


def test_default_format_row_arrays(small_df):
    body = json.loads(format_result(small_df, None)[0])
    assert body == [[0, "NATION_0"], [1, "NATION_1"], [2, "NATION_2"]]


def test_cache_lru_eviction():
    c = QueryCache(maxsize=2)
    c.put("a", b"1", "t")
    c.put("b", b"2", "t")
    c.get("a")  # refresh a
    c.put("c", b"3", "t")  # evicts b
    assert c.get("a") and c.get("c") and c.get("b") is None


def test_user_namespace_hashing():
    assert user_namespace(None, None) == "default"
    a = user_namespace("alice", "pw")
    assert a.startswith("user_") and a == user_namespace("alice", "pw")
    assert a != user_namespace("alice", "other")


def test_path_like_database_param_rejected_loudly(client):
    """The reference ATTACHes the `database` param as a DuckDB file path
    (main.py:284); we have no file to attach, so a path-like value must
    produce an explicit 400, not a namespace quietly named like a path."""
    r = client.get("/?query=SELECT 1&database=/data/mydb.duckdb")
    assert r.status_code == 400
    assert b"not supported" in r.data and b"namespace" in r.data


# --- HTTP app ---------------------------------------------------------------

@pytest.fixture(scope="module")
def client(spark):
    flask = pytest.importorskip("flask")  # noqa: F841
    from quackflight_spark.serving.http_app import create_app

    app = create_app(spark)
    app.config["TESTING"] = True
    return app.test_client()


def test_http_ping(client):
    r = client.get("/ping")
    assert r.status_code == 200 and r.data == b"Ok.\n"


def test_http_get_query(client):
    r = client.get("/?query=SELECT count() AS c FROM nation&default_format=JSONCompact")
    assert r.status_code == 200
    assert json.loads(r.data)["data"] == [[25]]


def test_http_format_clause_in_query(client):
    r = client.get("/?query=SELECT 1 AS one FORMAT JSONEachRow")
    assert json.loads(r.data.strip()) == {"one": 1}


def test_http_post_body_query(client):
    r = client.post("/", data=b"SELECT n_name FROM nation\nWHERE n_nationkey = 3")
    assert r.status_code == 200
    assert b"NATION_3" in r.data


def test_http_error_400(client):
    r = client.get("/?query=SELECT bogus_column FROM nation")
    assert r.status_code == 400
    assert b"bogus_column" in r.data or b"BOGUS_COLUMN" in r.data.upper()


def test_http_query_id_cache(client):
    r1 = client.get("/?query=SELECT 42 AS answer&query_id=qid1")
    assert r1.status_code == 200
    # reference behavior: query_id with NO query serves cached bytes
    r2 = client.get("/?query_id=qid1")
    assert r2.status_code == 200 and r2.data == r1.data


def test_http_get_play_console(client):
    """GET /play serves the browser query console (reference serves
    quack-ui's index.html, main.py:340-342)."""
    r = client.get("/play")
    assert r.status_code == 200
    assert r.content_type.startswith("text/html")
    assert b"<html" in r.data.lower() and b"query" in r.data.lower()
    # POST /play still executes queries (both routes, reference main.py:306)
    r2 = client.post("/play?default_format=JSONCompact", data=b"SELECT 1 AS one")
    assert r2.status_code == 200 and b'"one"' in r2.data
    # unknown paths fall back to the console, matching the reference's SPA
    # 404 handler (main.py:350-352)
    r3 = client.get("/no/such/path")
    assert r3.status_code == 200 and b"<html" in r3.data.lower()


def test_http_insert_ndjson(client, spark):
    spark.sql("DROP TABLE IF EXISTS _ins_test")
    spark.sql("CREATE TABLE _ins_test (a BIGINT, b STRING) USING parquet")
    body = b'{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n'
    r = client.post("/?query=INSERT INTO _ins_test FORMAT JSONEachRow", data=body)
    assert r.status_code == 200
    assert spark.table("_ins_test").count() == 2
    spark.sql("DROP TABLE _ins_test")


# --- Flight server ----------------------------------------------------------

@pytest.fixture(scope="module")
def flight_client(spark):
    fl = pytest.importorskip("pyarrow.flight")
    from quackflight_spark.serving.flight_server import SparkFlightServer

    server = SparkFlightServer(spark, "grpc://127.0.0.1:0")
    import threading

    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    client = fl.connect(f"grpc://127.0.0.1:{server.port}")
    yield client
    server.shutdown()


def test_flight_do_get(flight_client):
    import pyarrow.flight as fl

    ticket = fl.Ticket(json.dumps({"query": "SELECT n_nationkey, n_name FROM nation"}).encode())
    table = flight_client.do_get(ticket).read_all()
    assert table.num_rows == 25
    assert table.column_names == ["n_nationkey", "n_name"]


def test_flight_do_get_multistatement(flight_client):
    """CTAS + SELECT multi-statement ticket (examples/flight_read.py:7)."""
    import pyarrow.flight as fl

    sql = (
        "CREATE OR REPLACE TEMPORARY VIEW _fl_t AS SELECT version(), now(); "
        "SELECT * FROM _fl_t;"
    )
    table = flight_client.do_get(fl.Ticket(sql.encode())).read_all()
    assert table.num_rows == 1


def test_flight_get_info_lazy_schema(flight_client):
    import pyarrow.flight as fl

    desc = fl.FlightDescriptor.for_command(b"SELECT n_nationkey, n_name FROM nation")
    info = flight_client.get_flight_info(desc)
    assert [f.name for f in info.schema] == ["n_nationkey", "n_name"]


def test_flight_batches_chunked(flight_client):
    """Results stream in ≤1024-row RecordBatches (reference main.py:782)."""
    import pyarrow.flight as fl

    ticket = fl.Ticket(b"SELECT l_orderkey FROM lineitem")
    reader = flight_client.do_get(ticket)
    sizes = [chunk.data.num_rows for chunk in reader]
    assert sum(sizes) == 6000
    assert max(sizes) <= 1024


def test_flight_list_actions_create_schema(flight_client, spark):
    import pyarrow.flight as fl

    res = list(
        flight_client.do_action(
            fl.Action("create_schema", json.dumps({"schema": "cat.flight_test_db"}).encode())
        )
    )
    assert res[0].body.to_pybytes() == b"ok"
    assert any(d.name == "flight_test_db" for d in spark.catalog.listDatabases())
    res = list(flight_client.do_action(fl.Action("list_schemas", b"{}")))
    # reference envelope (main.py:581-594): [4-byte LE msgpack length,
    # zstd(msgpack(catalog_root))] as two Result bodies
    from quackflight_spark.serving.airport_codec import decode_action_reply

    assert len(res) == 2
    length_bytes = res[0].body.to_pybytes()
    compressed = res[1].body.to_pybytes()
    assert len(length_bytes) == 4
    assert compressed[:4] == bytes.fromhex("28b52ffd")  # zstd frame magic
    catalog_root = decode_action_reply(length_bytes, compressed)
    assert set(catalog_root) == {"contents", "schemas"}
    entries = {s["schema"]: s for s in catalog_root["schemas"]}
    assert "flight_test_db" in entries
    assert set(entries["flight_test_db"]) == {
        "schema", "description", "tags", "type", "contents"
    }


def test_flight_canned_flights_roundtrip(flight_client):
    """The four canned catalog flights (reference main.py:496-521) are
    listed as real FlightInfo objects and every ticket executes."""
    import pyarrow.flight as fl

    infos = list(flight_client.list_flights())
    canned = {
        i.descriptor.command.decode(): i
        for i in infos
        if i.descriptor.descriptor_type == fl.DescriptorType.CMD
    }
    assert set(canned) >= {"show_databases", "show_tables", "show_version",
                           "list_schemas"}
    for info in canned.values():
        table = flight_client.do_get(info.endpoints[0].ticket).read_all()
        assert table.schema.equals(info.schema)  # advertised schema is real
    dbs_ticket = canned["show_databases"].endpoints[0].ticket
    t = flight_client.do_get(dbs_ticket).read_all()
    assert "default" in t.to_pydict()[t.schema.names[0]]


def test_airport_codec_roundtrip():
    """Minimal msgpack encoder: canonical bytes for the payload shapes the
    envelope uses, verified against hand-computed spec encodings."""
    from quackflight_spark.serving.airport_codec import (
        decode_action_reply,
        encode_action_reply,
        packb,
        unpackb,
    )

    # spec vectors (msgpack.org): fixmap/fixstr/nil/true/fixint/fixarray
    assert packb({}) == b"\x80"
    assert packb([1, 2]) == b"\x92\x01\x02"
    assert packb("abc") == b"\xa3abc"
    assert packb(None) == b"\xc0"
    assert packb(True) == b"\xc3"
    assert packb(200) == b"\xcc\xc8"
    assert packb(-5) == b"\xfb"
    assert packb(70000) == b"\xce\x00\x01\x11\x70"
    payload = {
        "contents": {"url": None, "sha256": None, "serialized": None},
        "schemas": [
            {"schema": "s1", "description": "d", "tags": {}, "type": "table",
             "contents": {"url": None, "sha256": None, "serialized": None}},
        ],
    }
    assert unpackb(packb(payload)) == payload
    assert decode_action_reply(*encode_action_reply(payload)) == payload


def test_flight_bearer_auth_namespace(flight_client, spark):
    """Bearer user:password → per-user namespace session (reference
    main.py:749-762 semantics, race-free)."""
    import pyarrow.flight as fl

    opts = fl.FlightCallOptions(headers=[(b"authorization", b"Bearer erin:pw")])
    flight_client.do_get(
        fl.Ticket(b"CREATE TABLE IF NOT EXISTS flt (v BIGINT) USING parquet; "
                  b"INSERT INTO flt VALUES (7); SELECT 1 AS ok;"),
        options=opts,
    ).read_all()
    t = flight_client.do_get(
        fl.Ticket(b"SELECT max(v) AS v FROM flt"), options=opts
    ).read_all()
    assert t.to_pydict()["v"] == [7]
    # unauthenticated request resolves in the default namespace → no table
    import pytest as _pytest

    with _pytest.raises(Exception):
        flight_client.do_get(fl.Ticket(b"SELECT max(v) AS v FROM flt")).read_all()
    from quackflight_spark.serving.namespaces import user_namespace

    spark.sql(f"DROP DATABASE IF EXISTS {user_namespace('erin','pw')} CASCADE")
