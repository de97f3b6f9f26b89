"""Exact-match response cache + feedback store (SQLite or Postgres).

Keeps the reference's cache semantics exactly (reference
database.py:52-86, main.py:249-265, 307-317):

- key = ``sha256(f"{ticker}_{query.lower()}")`` (utils/hashing.py),
  lookup by (query_hash AND ticker) before the pipeline runs;
- write-behind after answering; duplicate writes tolerated;
- per-ticker invalidation for ``DELETE /cache/clear/{ticker}``, called
  at the end of ingestion;
- ``user_feedback`` rows of (query_hash, rating ±1);
- the cache doubles as a query/answer log for fine-tuning (the
  reference README calls this out), which train/contrastive.py consumes.

Backend selection mirrors the reference's DATABASE_URL dispatch
(reference database.py:44-50: pooled Postgres in production, SQLite
under TESTING): a ``postgres://``/``postgresql://`` URL connects
through a DB-API driver (psycopg2 or pg8000, whichever is installed, or
an injected one for tests); anything else is a SQLite file path.  A
first-party ordered-migration runner stands in for alembic
(schema_version table), reference alembic/.
"""

from __future__ import annotations

import os
import sqlite3
import threading
import time
from typing import Any

# dialect-templated migrations: {pk} = autoincrement primary key,
# {float} = 8-byte float column.  Statements are a LIST per migration
# (never split on ";" at runtime — a ";" inside a string literal or a
# PL/pgSQL body would mis-split), and each migration commits atomically
# with its schema_version row so a mid-script failure never leaves a
# half-applied prefix that re-runs on the next startup.
MIGRATIONS: list[tuple[int, tuple[str, ...]]] = [
    (
        1,
        (
            """
            CREATE TABLE IF NOT EXISTS query_cache (
                id {pk},
                query_hash TEXT NOT NULL UNIQUE,
                ticker TEXT NOT NULL,
                query_text TEXT NOT NULL,
                response TEXT NOT NULL,
                provider TEXT,
                created_at {float} NOT NULL
            )
            """,
            "CREATE INDEX IF NOT EXISTS ix_cache_ticker ON query_cache (ticker)",
            "CREATE INDEX IF NOT EXISTS ix_cache_ticker_hash"
            " ON query_cache (ticker, query_hash)",
            """
            CREATE TABLE IF NOT EXISTS user_feedback (
                id {pk},
                query_hash TEXT NOT NULL,
                rating INTEGER NOT NULL,
                created_at {float} NOT NULL
            )
            """,
            "CREATE INDEX IF NOT EXISTS ix_feedback_hash"
            " ON user_feedback (query_hash)",
        ),
    ),
]


def _is_postgres_url(path: str) -> bool:
    return path.startswith(("postgres://", "postgresql://"))


class _SqliteBackend:
    """stdlib sqlite3 with WAL — single-node serving and TESTING."""

    param = "?"
    pk_sql = "INTEGER PRIMARY KEY AUTOINCREMENT"
    float_sql = "REAL"
    upsert_prefix = "INSERT OR REPLACE"
    upsert_suffix = ""

    def __init__(self, path: str):
        if path not in (":memory:",) and os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
        # timeout + busy_timeout: multi-process serving opens the same
        # file from the coordinator AND workers, and their startup
        # migrations race — the 5 s default lock wait loses under 1-CPU
        # contention ("database is locked" on a cold 2-process start).
        self._conn = sqlite3.connect(path, check_same_thread=False, timeout=30)
        self._conn.execute("PRAGMA journal_mode=WAL")
        self._conn.execute("PRAGMA busy_timeout=30000")

    def execute(self, sql: str, params: tuple = ()):
        return self._conn.execute(sql, params)

    def commit(self) -> None:
        self._conn.commit()

    def close(self) -> None:
        self._conn.close()


class _PostgresBackend:
    """DB-API Postgres backend (reference database.py:44-50 pooled path).

    ``driver`` injects any DB-API module (tests use a sqlite-backed shim);
    otherwise psycopg2 then pg8000 are tried.  One connection per CacheDB
    — CacheDB's lock already serializes access, which stands in for the
    reference's pool_size=10 QueuePool on this single-writer workload.
    """

    param = "%s"
    pk_sql = "BIGSERIAL PRIMARY KEY"
    float_sql = "DOUBLE PRECISION"
    upsert_prefix = "INSERT"
    upsert_suffix = (
        " ON CONFLICT (query_hash) DO UPDATE SET"
        " ticker=EXCLUDED.ticker, query_text=EXCLUDED.query_text,"
        " response=EXCLUDED.response, provider=EXCLUDED.provider,"
        " created_at=EXCLUDED.created_at"
    )

    def __init__(self, url: str, driver: Any | None = None):
        driver = driver or self._find_driver()
        try:
            self._conn = driver.connect(url)
        except TypeError:
            # drivers like pg8000 take parsed kwargs, not a DSN string
            self._conn = driver.connect(**self._parse(url))

    @staticmethod
    def _find_driver() -> Any:
        for name in ("psycopg2", "pg8000.dbapi", "pg8000"):
            try:
                import importlib

                return importlib.import_module(name)
            except ImportError:
                continue
        raise ImportError(
            "DATABASE_URL is a postgres:// URL but no Postgres driver is "
            "installed (tried psycopg2, pg8000); install one or point "
            "DATABASE_URL at a SQLite path"
        )

    @staticmethod
    def _parse(url: str) -> dict[str, Any]:
        from urllib.parse import urlsplit

        u = urlsplit(url)
        kw: dict[str, Any] = {"database": (u.path or "/").lstrip("/") or "postgres"}
        if u.username:
            kw["user"] = u.username
        if u.password:
            kw["password"] = u.password
        if u.hostname:
            kw["host"] = u.hostname
        if u.port:
            kw["port"] = u.port
        return kw

    def execute(self, sql: str, params: tuple = ()):
        cur = self._conn.cursor()
        cur.execute(sql, params)
        return cur

    def commit(self) -> None:
        self._conn.commit()

    def close(self) -> None:
        self._conn.close()


class CacheDB:
    """Thread-safe cache + feedback store over either backend."""

    def __init__(self, path: str = "frs_cache.db", *, pg_driver: Any | None = None):
        self.path = path
        self._lock = threading.Lock()
        if _is_postgres_url(path):
            self._db: _SqliteBackend | _PostgresBackend = _PostgresBackend(
                path, driver=pg_driver
            )
        else:
            self._db = _SqliteBackend(path)
        self._p = self._db.param
        self._migrate()

    def _migrate(self) -> None:
        db = self._db
        with self._lock:
            db.execute(
                "CREATE TABLE IF NOT EXISTS schema_version (version INTEGER NOT NULL)"
            )
            db.commit()
            row = db.execute("SELECT MAX(version) FROM schema_version").fetchone()
            current = row[0] or 0
            for version, statements in MIGRATIONS:
                if version > current:
                    for stmt in statements:
                        db.execute(stmt.format(pk=db.pk_sql, float=db.float_sql))
                    db.execute(
                        f"INSERT INTO schema_version (version) VALUES ({self._p})",
                        (version,),
                    )
                    # one commit per migration, after its version row: the
                    # migration and its version record land atomically
                    db.commit()
            db.commit()

    # -- cache ---------------------------------------------------------

    def lookup(self, query_hash: str, ticker: str) -> str | None:
        with self._lock:
            row = self._db.execute(
                "SELECT response FROM query_cache "
                f"WHERE query_hash={self._p} AND ticker={self._p} "
                "ORDER BY id DESC LIMIT 1",
                (query_hash, ticker),
            ).fetchone()
        return row[0] if row else None

    def save(
        self,
        query_hash: str,
        ticker: str,
        query: str,
        response: str,
        provider: str | None = None,
    ) -> None:
        # query_hash is unique (reference database.py:74); re-answers replace
        p = self._p
        with self._lock:
            self._db.execute(
                f"{self._db.upsert_prefix} INTO query_cache "
                "(query_hash, ticker, query_text, response, provider, created_at) "
                f"VALUES ({p},{p},{p},{p},{p},{p})"
                f"{self._db.upsert_suffix}",
                (query_hash, ticker.upper(), query, response, provider, time.time()),
            )
            self._db.commit()

    def clear_ticker(self, ticker: str) -> int:
        with self._lock:
            cur = self._db.execute(
                f"DELETE FROM query_cache WHERE ticker={self._p}",
                (ticker.upper(),),
            )
            self._db.commit()
            return cur.rowcount

    def cache_count(self) -> int:
        with self._lock:
            return self._db.execute(
                "SELECT COUNT(*) FROM query_cache"
            ).fetchone()[0]

    # -- feedback --------------------------------------------------------

    def add_feedback(self, query_hash: str, rating: int) -> None:
        p = self._p
        with self._lock:
            self._db.execute(
                "INSERT INTO user_feedback (query_hash, rating, created_at) "
                f"VALUES ({p},{p},{p})",
                (query_hash, rating, time.time()),
            )
            self._db.commit()

    def feedback_count(self) -> int:
        with self._lock:
            return self._db.execute(
                "SELECT COUNT(*) FROM user_feedback"
            ).fetchone()[0]

    # -- fine-tune log export (cache as training data) --------------------

    def export_pairs(self, limit: int = 10000) -> list[tuple[str, str]]:
        with self._lock:
            rows = self._db.execute(
                "SELECT query_text, response FROM query_cache "
                f"ORDER BY id DESC LIMIT {self._p}",
                (limit,),
            ).fetchall()
        return [(q, r) for q, r in rows]

    def export_rated_pairs(
        self, limit: int = 10000
    ) -> list[tuple[str, str, int]]:
        """(query, response, net feedback rating) rows, newest first.

        Joins the cache log with ``user_feedback`` (summing the ±1
        ratings per query_hash; unrated queries net 0) so training-data
        consumers can weight or drop entries by user judgment — the
        feedback table is the reference's quality signal on exactly
        these cached answers (reference database.py:58-67 + README
        fine-tuning note).  Grouping by the primary key keeps the query
        valid on both SQLite and Postgres.
        """
        with self._lock:
            rows = self._db.execute(
                "SELECT c.query_text, c.response, "
                "COALESCE(SUM(f.rating), 0) AS net "
                "FROM query_cache c "
                "LEFT JOIN user_feedback f ON f.query_hash = c.query_hash "
                "GROUP BY c.id, c.query_text, c.response "
                f"ORDER BY c.id DESC LIMIT {self._p}",
                (limit,),
            ).fetchall()
        return [(q, r, int(net)) for q, r, net in rows]

    def close(self) -> None:
        with self._lock:
            self._db.close()
