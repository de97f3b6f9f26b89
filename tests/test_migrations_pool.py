"""Migration downgrades + pooled Postgres backend (VERDICT r4 #5, #8).

The migration runner carries per-migration down-statements (the
first-party analogue of the reference's alembic ``downgrade()``,
reference alembic/versions/26bc97b42bb7_init.py:34-46) and the Postgres
backend rides a lazy connection pool sized like the reference's
QueuePool (pool_size=5, max_overflow=10, reference database.py:44-50)
instead of one global-locked socket.
"""

import threading
import time

import pytest

from financial_rag_system_tpu.serving.cache import CacheDB, _PgPool

from tests.test_cache_pg import URL, FakeDsnDriver


def _table_names(db: CacheDB) -> set[str]:
    rows = db._db.execute(
        "SELECT name FROM sqlite_master WHERE type='table'"
    ).fetchall()
    return {r[0] for r in rows}


@pytest.mark.parametrize("backend", ["sqlite", "pg"])
def test_migration_up_down_up_roundtrip(tmp_path, backend):
    if backend == "sqlite":
        db = CacheDB(str(tmp_path / "c.db"))
    else:
        # sqlite-backed pg shim: the FULL pg dialect path executes
        db = CacheDB(URL, pg_driver=FakeDsnDriver())
    assert db.schema_version() == 1
    db.save("h1", "AAPL", "q", "a", "Groq")
    assert {"query_cache", "user_feedback"} <= _table_names(db)

    assert db.downgrade(0) == 0
    names = _table_names(db)
    assert "query_cache" not in names and "user_feedback" not in names

    # re-upgrade restores a working (empty) schema
    db._migrate()
    assert db.schema_version() == 1
    assert db.cache_count() == 0
    db.save("h2", "AAPL", "q2", "a2", "Groq")
    assert db.lookup("h2", "AAPL") == "a2"
    db.close()


def test_downgrade_partial_target_noop_when_current():
    db = CacheDB(":memory:")
    # downgrading to the current version is a no-op
    assert db.downgrade(1) == 1
    assert db.lookup("nope", "AAPL") is None  # tables still live
    db.close()


class _CountingPool:
    """connect() factory that tracks open/close balance."""

    def __init__(self, fail_first=0):
        self.opened = 0
        self.closed = []
        self.fail_first = fail_first
        self.lock = threading.Lock()

    def connect(self):
        with self.lock:
            if self.fail_first > 0:
                self.fail_first -= 1
                raise OSError("server unreachable")
            self.opened += 1
            n = self.opened

        pool = self

        class Conn:
            ident = n

            def close(self):
                pool.closed.append(n)

        return Conn()


def test_pool_lazy_and_reuses_single_connection():
    f = _CountingPool()
    pool = _PgPool(f.connect, pool_size=5, max_overflow=10)
    assert f.opened == 0  # lazy: nothing opens at construction
    for _ in range(8):  # sequential churn reuses one connection
        c = pool.acquire()
        pool.release(c)
    assert f.opened == 1
    pool.close()
    assert f.closed == [1]


def test_pool_overflow_closes_on_release():
    f = _CountingPool()
    pool = _PgPool(f.connect, pool_size=2, max_overflow=3)
    held = [pool.acquire() for _ in range(5)]
    assert f.opened == 5
    # 6th acquire blocks until a release
    got = []

    def waiter():
        got.append(pool.acquire())

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.1)
    assert not got  # still blocked at the 5-connection cap
    pool.release(held.pop())
    t.join(timeout=5)
    assert len(got) == 1
    # release everything: only pool_size=2 idle are retained, the
    # overflow connections close
    for c in held + got:
        pool.release(c)
    assert len(f.closed) == 3
    pool.close()
    assert len(f.closed) == 5


def test_pool_failed_connect_frees_slot():
    f = _CountingPool(fail_first=1)
    pool = _PgPool(f.connect, pool_size=1, max_overflow=0)
    with pytest.raises(OSError):
        pool.acquire()
    # the failed attempt must not leak its slot
    c = pool.acquire()
    pool.release(c)
    pool.close()


def test_pool_discard_drops_broken_connection():
    f = _CountingPool()
    pool = _PgPool(f.connect, pool_size=2, max_overflow=0)
    c = pool.acquire()
    pool.release(c, discard=True)
    assert f.closed == [1]
    c2 = pool.acquire()  # a fresh connection replaces it
    assert c2.ident == 2
    pool.close()


def test_cachedb_concurrent_sqlite_safe(tmp_path):
    """No CacheDB-level lock anymore: the sqlite backend's tx lock must
    keep 8 mixed readers/writers safe on one shared connection."""
    db = CacheDB(str(tmp_path / "c.db"))
    errors = []

    def work(tid):
        try:
            for i in range(25):
                db.save(f"h{tid}", "AAPL", "q", f"a{tid}-{i}")
                db.lookup(f"h{tid}", "AAPL")
                db.add_feedback(f"h{tid}", 1)
        except Exception as e:  # pragma: no cover - failure evidence
            errors.append(e)

    ts = [threading.Thread(target=work, args=(t,)) for t in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert db.cache_count() == 8
    assert db.feedback_count() == 200
    db.close()
