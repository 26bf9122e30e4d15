"""The empty-RefBundle schema warning filter (VERDICT r1 item 9)."""
import logging


def test_refbundle_schema_warning_filtered():
    import ctdray  # noqa: F401 — installs the filter on import
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    rec = logging.LogRecord(
        name=logger.name, level=logging.WARNING, pathname="x", lineno=1,
        msg="Operator produced a RefBundle with a different schema "
            "than the previous one. Previous schema: k: int64, new "
            "schema: . This may lead to unexpected behavior.",
        args=(), exc_info=None)
    assert not logger.filter(rec)
    other = logging.LogRecord(
        name=logger.name, level=logging.WARNING, pathname="x", lineno=1,
        msg="some other executor warning", args=(), exc_info=None)
    assert logger.filter(other)
