"""Per-user namespaces — the Spark analog of the reference's per-user
DuckDB database files.

Reference: sha256(username+password) → "{hash}.db" file per user,
anonymous → shared in-memory DB (ConnectionManager, main.py:71-114; the
same logic repeated in Flight handlers :523-535, 749-762). One engine
process, N isolated catalogs.

Spark analog: one SparkSession, per-user *database* (namespace) named
user_{hash16}; anonymous → 'default'. Isolation is namespace-level in a
shared metastore — weaker than separate files (documented deviation,
SURVEY §7). Unlike the reference, nothing here mutates shared
connection state per request (the reference's self.conn rebinding race,
main.py:762, is listed in SURVEY §7 as a bug not to replicate): the
database name is returned and used query-locally.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import SparkSession


def user_namespace(user: str | None, password: str | None) -> str:
    """Hash credentials → namespace name (reference main.py:108-114)."""
    if not user:
        return "default"
    h = hashlib.sha256(f"{user}:{password or ''}".encode()).hexdigest()[:16]
    return f"user_{h}"


_SAFE_DB = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def ensure_namespace(spark: SparkSession, name: str) -> str:
    """CREATE DATABASE IF NOT EXISTS (identifier-validated, no f-string
    injection — the reference's f-string DDL is another §7 bug).

    The reference literally ATTACHes the `database` parameter as a DuckDB
    *file path* per request (main.py:284, 326). A distributed engine has
    no single-file database to attach, so path-like values (anything that
    is not a bare identifier) are REJECTED here with an explicit message
    rather than silently mapped to a namespace that does not contain the
    file's data — an honest loud deviation instead of a quiet wrong one."""
    if not _SAFE_DB.match(name):
        raise ValueError(
            f"invalid namespace name: {name!r}. The `database` parameter "
            "selects a managed namespace (bare identifier), not a database "
            "file; attaching external .duckdb/.db files is not supported — "
            "register the data as tables instead"
        )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    return name


def use_namespace(spark: SparkSession, name: str) -> None:
    """USE db — reference main.py:284 `ATTACH '{db}' AS db; USE db;`
    behavior for the HTTP `database` parameter. NOTE: mutates the given
    session's current database — for concurrent serving use
    SessionManager, which isolates per user."""
    ensure_namespace(spark, name)
    spark.catalog.setCurrentDatabase(name)


class SessionManager:
    """Per-namespace child sessions — the Spark analog of the reference's
    ConnectionManager (per-user DuckDB connection cache, main.py:71-105).

    `newSession()` shares the SparkContext, metastore and cached data but
    isolates session state (current database, temp views, SQL conf), so
    two users' requests can run concurrently without racing on
    setCurrentDatabase — the reference's shared-self.conn race
    (main.py:762, SURVEY §7) fixed structurally. Child sessions see
    metastore tables but not the root session's temp views (use GLOBAL
    TEMPORARY VIEWs for shared scratch data)."""

    def __init__(self, root: SparkSession):
        import threading

        self.root = root
        self._sessions: dict[str, SparkSession] = {}
        self._lock = threading.Lock()

    def for_namespace(self, namespace: str | None) -> SparkSession:
        if not namespace or namespace == "default":
            return self.root
        with self._lock:
            if namespace not in self._sessions:
                s = self.root.newSession()
                ensure_namespace(s, namespace)
                s.catalog.setCurrentDatabase(namespace)
                self._sessions[namespace] = s
            return self._sessions[namespace]
