"""Worker-failure tolerance: on a real N-node cluster tasks die
(preemption, OOM-kill, node loss). Ray retries SYSTEM failures
automatically; for application-surfaced crashes a stage opts in with
retry_exceptions / max_task_retries. These tests inject a one-time
crash per task into a map_batches stage and verify the pipeline
completes with results identical to a clean run — the single-box
stand-in for killing workers mid-job.

All UDFs are defined inside the tests so cloudpickle ships them by
value (the tests directory is not importable inside Ray workers)."""

import os
import tempfile
import uuid

SF = "/root/testdata/sf0.001/documents.parquet"


def _make_udfs(marker_dir):
    """Build (clean_udf, crash_once_udf) as closures — pickled by value."""
    def ntok(batch):
        import numpy as np
        import pyarrow as pa
        n = pa.compute.list_value_length(
            pa.compute.split_pattern(batch["text"], " "))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tok": pa.array(n.to_numpy(zero_copy_only=False)
                                           .astype(np.int64), pa.int64())})

    def crash_once(batch):
        key = int(batch["doc_id"][0].as_py())
        marker = os.path.join(marker_dir, f"crashed_{key}")
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
            raise RuntimeError(f"injected crash for batch {key}")
        return ntok(batch)

    def die_once(batch):
        """First attempt per batch kills the WORKER PROCESS (the real
        node-loss/OOM-kill shape, not a Python exception)."""
        key = int(batch["doc_id"][0].as_py())
        marker = os.path.join(marker_dir, f"died_{key}")
        if not os.path.exists(marker):
            fd = os.open(marker, os.O_CREAT | os.O_WRONLY)
            os.fsync(fd)
            os.close(fd)
            os._exit(1)
        return ntok(batch)

    return ntok, crash_once, die_once


def test_actor_death_recovery_matches_clean_run(ray_session):
    import ray.data as rd

    marker_dir = tempfile.mkdtemp(prefix=f"ft_{uuid.uuid4().hex[:8]}_")
    ntok, crash_once, die_once = _make_udfs(marker_dir)
    clean = (rd.read_parquet(SF, columns=["doc_id", "text"])
             .map_batches(ntok, batch_format="pyarrow")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))

    class DieOnceActor:
        """Stateful-stage variant: each actor process is KILLED
        (os._exit) on its first batch — max_restarts replaces the dead
        actor and max_task_retries resubmits its lost task, the real
        node-loss recovery path. File markers survive worker
        replacement — a per-process global would not."""

        def __init__(self, fn):
            self.fn = fn

        def __call__(self, batch):
            return self.fn(batch)

    got = (rd.read_parquet(SF, columns=["doc_id", "text"])
           .map_batches(DieOnceActor,
                        fn_constructor_kwargs={"fn": die_once},
                        batch_format="pyarrow", batch_size=250,
                        concurrency=2,
                        max_restarts=8, max_task_retries=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    assert os.listdir(marker_dir), "fault injection never fired"
    assert got.equals(clean)


def test_retried_task_stage_matches_clean_run(ray_session):
    import ray.data as rd

    marker_dir = tempfile.mkdtemp(prefix=f"ft_{uuid.uuid4().hex[:8]}_")
    ntok, crash_once, _ = _make_udfs(marker_dir)
    clean = (rd.read_parquet(SF, columns=["doc_id", "text"])
             .map_batches(ntok, batch_format="pyarrow")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))

    got = (rd.read_parquet(SF, columns=["doc_id", "text"])
           .map_batches(crash_once, batch_format="pyarrow", batch_size=64,
                        retry_exceptions=True, max_retries=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    assert os.listdir(marker_dir), "fault injection never fired"
    assert got.equals(clean)
