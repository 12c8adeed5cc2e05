"""web_pages source: HTML text extraction (HTMLStripCharFilter
subset) and the input-hint per-row invariant (byte-identical extracted
text per url over the synthetic derivation)."""

from __future__ import annotations



import pyarrow as pa

def test_extract_text_entities_and_tags(ray_session):
    """HTMLStripCharFilter-subset extractor: nested tags, attributes,
    entities; and the per-row invariant over the synthetic derivation."""
    import ray.data

    from lucene_ray.sources.web_pages import (
        extract_text,
        extract_text_batch,
        load_web_pages,
    )

    hostile = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "html": pa.array(
                [
                    b'<html><body class="x">a &amp; b &lt;c&gt;</body></html>',
                    b"<div><p>nested <b>bold</b></p></div>",
                    b"plain no markup",
                ],
                pa.binary(),
            ),
        }
    )
    out = extract_text_batch(hostile)
    got = out.column("text_extracted").to_pylist()
    assert got == ["a & b <c>", "nested bold", "plain no markup"]
    assert "html" not in out.schema.names  # wide column dropped

    # per-row invariant over the derivation: extracted == original text
    pages = load_web_pages("/root/testdata/sf0.001", include_html=True)
    joined = extract_text(pages).take_all()
    assert all(r["text_extracted"] == r["text"] for r in joined)
    assert len(joined) == 500
