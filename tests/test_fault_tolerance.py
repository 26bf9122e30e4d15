"""Worker-loss resilience (SURVEY.md §4 fault row): a task worker dying
mid-batch is retried by Ray and the pipeline completes with EXACT output —
the process-level complement of the poison-pill row contract (the reference
loop dies on first error, inference.py:28)."""
import os

import pyarrow as pa
import pytest

from ctdray.fixtures import make_corpus
from ctdray.oracle import flatten_out_docs, run_oracle

KEY = ["doc_id", "seq", "kind", "text", "media_ref", "offset", "order"]


def _crash_once(marker: str):
    """Identity map_batches fn that SIGKILLs its own worker process the
    first time any worker runs it (filesystem marker makes it one-shot)."""
    def fn(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)
        return batch
    return fn


def test_worker_death_retried(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": list(range(100))})) \
        .map_batches(_crash_once(str(tmp_path / "m1")), batch_format="pyarrow")
    assert ds.count() == 100


def test_actor_death_restarted(ray_session, tmp_path):
    """Actor-pool stages (the prod-GPU detect layout's infer pool) recover
    too: Ray Data restarts the dead actor and retries its in-flight batch."""
    import ray.data as rd

    marker = str(tmp_path / "actor_m")

    class CrashOnceActor:
        def __call__(self, batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                open(marker, "w").close()
                os._exit(1)
            return batch

    ds = rd.from_arrow(pa.table({"x": list(range(100))})) \
        .map_batches(CrashOnceActor, concurrency=2, batch_format="pyarrow")
    assert ds.count() == 100
    assert os.path.exists(marker)


def test_pipeline_output_exact_after_worker_loss(ray_session, tmp_path):
    """Kill a worker inside the headline pipeline's upstream; the retried
    task re-executes and the final span table still equals the oracle."""
    import ray.data as rd

    from ctdray.pipelines.extract import build_flat_spans

    corpus = make_corpus(8)
    docs = rd.from_arrow(corpus).map_batches(
        _crash_once(str(tmp_path / "m2")), batch_format="pyarrow")
    got = build_flat_spans(docs).to_pandas()[KEY].sort_values(KEY) \
        .reset_index(drop=True)
    assert os.path.exists(str(tmp_path / "m2"))      # the crash DID happen
    exp = flatten_out_docs(run_oracle(corpus)).to_pandas()[KEY] \
        .sort_values(KEY).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert got.equals(exp)
