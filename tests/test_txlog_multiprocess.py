"""Cross-PROCESS txlog contention (round-5 verdict #6): the commit
log's put-if-absent claim is `open(version_file, "x")` — O_CREAT|O_EXCL
— which must linearize across process boundaries, not just across
threads sharing one interpreter (tests/test_txlog.py:130,169 cover the
thread case). Children are spawned (fresh interpreters, no inherited
JVM or file-descriptor state) and touch only the filesystem commit
path: separate TxTable instances, separate processes, same log dir.
"""

from __future__ import annotations

import multiprocessing as mp

from streamprocess_spark.io.txlog import TxConflict, TxTable

_N_WRITERS = 4
_N_COMMITS = 6


def _retrying_writer(args):
    """Each commit: read latest, attempt put-if-absent, retry on
    conflict — the optimistic-concurrency loop every real writer runs."""
    path, tag = args
    t = TxTable(path)
    landed = []
    for i in range(_N_COMMITS):
        while True:
            v = t.latest_version()
            try:
                got = t.commit(
                    [{"add": {"path": f"{tag}-{i}.parquet", "rows": 1}}], v
                )
                landed.append(got)
                break
            except TxConflict:
                continue
    return tag, landed


def _barrier_racer(args):
    """All racers plan against the SAME snapshot version and fire
    together: exactly one open(..., 'x') may succeed."""
    path, tag, barrier = args
    t = TxTable(path)
    v = t.latest_version()
    barrier.wait(timeout=60)
    try:
        t.commit([{"add": {"path": f"{tag}.parquet", "rows": 1}}], v)
        return f"win:{tag}"
    except TxConflict:
        return f"lose:{tag}"


def test_multiprocess_writers_linearize(tmp_path):
    path = str(tmp_path / "t")
    t0 = TxTable(path)
    t0.commit([{"add": {"path": "seed.parquet", "rows": 1}}], -1)

    ctx = mp.get_context("spawn")
    with ctx.Pool(_N_WRITERS) as pool:
        results = pool.map(
            _retrying_writer,
            [(path, f"w{w}") for w in range(_N_WRITERS)],
        )

    t = TxTable(path)
    total = _N_WRITERS * _N_COMMITS
    # gap-free version chain: seed (v0) + every cross-process commit
    assert t.versions() == list(range(total + 1))
    # every writer's every file is live in the final snapshot — no
    # commit overwrote another despite heavy conflict-retry churn
    live = {f["path"] for f in t.snapshot_files()}
    want = {"seed.parquet"} | {
        f"w{w}-{i}.parquet"
        for w in range(_N_WRITERS) for i in range(_N_COMMITS)
    }
    assert live == want
    # each writer observed strictly increasing committed versions
    for _tag, landed in results:
        assert landed == sorted(landed) and len(set(landed)) == _N_COMMITS
    # and no version was claimed by two writers
    all_landed = [v for _t, landed in results for v in landed]
    assert len(all_landed) == len(set(all_landed)) == total


def test_multiprocess_same_version_conflict(tmp_path):
    path = str(tmp_path / "t")
    TxTable(path).commit([{"add": {"path": "seed.parquet", "rows": 1}}], -1)

    n = 4
    ctx = mp.get_context("spawn")
    with ctx.Manager() as mgr:
        barrier = mgr.Barrier(n)
        with ctx.Pool(n) as pool:
            outcomes = pool.map(
                _barrier_racer,
                [(path, f"p{i}", barrier) for i in range(n)],
            )

    wins = [o for o in outcomes if o.startswith("win:")]
    loses = [o for o in outcomes if o.startswith("lose:")]
    assert len(wins) == 1 and len(loses) == n - 1
    t = TxTable(path)
    assert t.latest_version() == 1  # exactly one commit published
    winner_tag = wins[0].split(":")[1]
    assert {f["path"] for f in t.snapshot_files()} == {
        "seed.parquet", f"{winner_tag}.parquet"
    }
