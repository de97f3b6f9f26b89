"""Exact-match response cache + feedback store (SQLite).

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

SQLAlchemy/Postgres isn't in this environment; stdlib sqlite3 with WAL
covers single-node serving. A first-party ordered-migration runner
stands in for alembic (schema_version table), reference alembic/.
"""

from __future__ import annotations

import os
import sqlite3
import threading
import time

MIGRATIONS: list[tuple[int, str]] = [
    (
        1,
        """
        CREATE TABLE IF NOT EXISTS query_cache (
            id INTEGER PRIMARY KEY AUTOINCREMENT,
            query_hash TEXT NOT NULL UNIQUE,
            ticker TEXT NOT NULL,
            query_text TEXT NOT NULL,
            response TEXT NOT NULL,
            provider TEXT,
            created_at REAL NOT NULL
        );
        CREATE INDEX IF NOT EXISTS ix_cache_ticker ON query_cache (ticker);
        CREATE INDEX IF NOT EXISTS ix_cache_ticker_hash ON query_cache (ticker, query_hash);
        CREATE TABLE IF NOT EXISTS user_feedback (
            id INTEGER PRIMARY KEY AUTOINCREMENT,
            query_hash TEXT NOT NULL,
            rating INTEGER NOT NULL,
            created_at REAL NOT NULL
        );
        CREATE INDEX IF NOT EXISTS ix_feedback_hash ON user_feedback (query_hash);
        """,
    ),
]


class CacheDB:
    """Thread-safe SQLite-backed cache + feedback store."""

    def __init__(self, path: str = "frs_cache.db"):
        self.path = path
        if path not in (":memory:",) and os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
        self._lock = threading.Lock()
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.execute("PRAGMA journal_mode=WAL")
        self._migrate()

    def _migrate(self) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS schema_version (version INTEGER NOT NULL)"
            )
            row = self._conn.execute(
                "SELECT MAX(version) FROM schema_version"
            ).fetchone()
            current = row[0] or 0
            for version, sql in MIGRATIONS:
                if version > current:
                    self._conn.executescript(sql)
                    self._conn.execute(
                        "INSERT INTO schema_version (version) VALUES (?)", (version,)
                    )

    # -- cache ---------------------------------------------------------

    def lookup(self, query_hash: str, ticker: str) -> str | None:
        with self._lock:
            row = self._conn.execute(
                "SELECT response FROM query_cache "
                "WHERE query_hash=? AND ticker=? ORDER BY id DESC LIMIT 1",
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
        with self._lock, self._conn:
            self._conn.execute(
                "INSERT OR REPLACE INTO query_cache "
                "(query_hash, ticker, query_text, response, provider, created_at) "
                "VALUES (?,?,?,?,?,?)",
                (query_hash, ticker.upper(), query, response, provider, time.time()),
            )

    def clear_ticker(self, ticker: str) -> int:
        with self._lock, self._conn:
            cur = self._conn.execute(
                "DELETE FROM query_cache WHERE ticker=?", (ticker.upper(),)
            )
            return cur.rowcount

    def cache_count(self) -> int:
        with self._lock:
            return self._conn.execute("SELECT COUNT(*) FROM query_cache").fetchone()[0]

    # -- feedback --------------------------------------------------------

    def add_feedback(self, query_hash: str, rating: int) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "INSERT INTO user_feedback (query_hash, rating, created_at) "
                "VALUES (?,?,?)",
                (query_hash, rating, time.time()),
            )

    def feedback_count(self) -> int:
        with self._lock:
            return self._conn.execute(
                "SELECT COUNT(*) FROM user_feedback"
            ).fetchone()[0]

    # -- fine-tune log export (cache as training data) --------------------

    def export_pairs(self, limit: int = 10000) -> list[tuple[str, str]]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT query_text, response FROM query_cache "
                "ORDER BY id DESC LIMIT ?",
                (limit,),
            ).fetchall()
        return [(q, r) for q, r in rows]

    def close(self) -> None:
        with self._lock:
            self._conn.close()
