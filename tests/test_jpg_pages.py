"""JPEG pages flow through the extraction pipeline (S2 format parity): the
shared decode_page helper dispatches by payload magic, so jpg:// media refs
decode instead of degrading to decode_ok=False poison pills."""
import numpy as np
import pyarrow as pa

from ctdray.schema import DOC_SCHEMA
from ctdray.sources.media import decode_page


def _jpg_doc(doc_id: str, n_pages: int = 2) -> dict:
    spans = []
    for off in range(n_pages):
        spans.append({"kind": "media", "text": "",
                      "media_ref": f"jpg://{doc_id}/{off}", "offset": off})
    spans.append({"kind": "text", "text": "hello", "media_ref": "",
                  "offset": n_pages})
    return {"doc_id": doc_id, "spans": spans}


def test_decode_page_jpg_matches_pgm_shape():
    a = decode_page("page://doc-00000000/0")
    b = decode_page("jpg://doc-00000000/0")
    assert a.shape == b.shape and b.dtype == np.uint8
    # lossy but close: baseline JPEG at q92 of the same rendered page
    assert float(np.mean(np.abs(a.astype(int) - b.astype(int)))) < 8.0


def test_jpg_pages_detected_not_dropped(ray_session):
    import ray.data as rd

    from ctdray.pipelines.extract import build_detected_spans
    from ctdray.stages.decode import DecodeStage
    from ctdray.stages.explode import explode_media_spans

    tbl = pa.Table.from_pylist([_jpg_doc("doc-00000000"),
                                _jpg_doc("doc-00000001")], schema=DOC_SCHEMA)
    pages = DecodeStage()(explode_media_spans(tbl))
    assert pages.column("decode_ok").to_pylist() == [True] * 4

    spans = build_detected_spans(rd.from_arrow(tbl)).to_pandas()
    assert len(spans) > 0
    assert set(spans.kind) == {"text_line"}
    assert all(r.startswith("jpg://") for r in spans.media_ref)
