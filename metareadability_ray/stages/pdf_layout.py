"""PDF / layout-parse plumbing (north_rule: "PDF/layout parse").

No PDF codec exists in this container, so the PARSE KERNEL IS A
DETERMINISTIC FAKE (clearly marked below) — exactly the multimodal-decode
pattern: the Arrow schemas (`pdf: binary` in, layout SPANS out), the
actor-pool stage shape, the flat_map explode from documents to per-span
rows, and the error accounting are all real and tested, so swapping in a
real parser (pdfminer/poppler on a real cluster) changes ONE method.

Span model (the layout-parse output a training pipeline consumes): one row
per (page, span) with a kind tag (heading/body), the span text, and a
bounding box — the "extracted text/spans per document" of the north rule.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

PDF_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("pdf", pa.binary()),
    ]
)

SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("page", pa.int32()),
        ("span_index", pa.int32()),
        ("kind", pa.string()),  # "heading" | "body"
        ("text", pa.string()),
        ("x0", pa.float32()),
        ("y0", pa.float32()),
        ("x1", pa.float32()),
        ("y1", pa.float32()),
    ]
)

_PAGE_BYTES = 800   # fake pagination granularity
_SPAN_CHARS = 200   # fake body-span granularity


def synth_pdf_batch(batch: pa.Table) -> pa.Table:
    """documents → fake `pdf` table (deterministic: a %PDF magic header +
    the utf-8 text). Used by tests/QA — real data arrives as Parquet."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    payloads = [b"%PDF-1.4\n" + (t or "").encode("utf-8") for t in texts]
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "pdf": pa.array(payloads, pa.binary())},
        schema=PDF_SCHEMA,
    )


def _fake_layout_parse(payload: bytes):
    """STUB PARSE — deterministic fake standing in for pdfminer/poppler.

    Checks the %PDF magic (raises like a real parser on junk), splits the
    body into fixed-size "pages", and emits per-page spans: one heading
    (first 40 chars) + body spans of ``_SPAN_CHARS``; bboxes derive from a
    blake2 digest so they are stable, layout-plausible floats.
    """
    if not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    body = payload.split(b"\n", 1)[1] if b"\n" in payload else b""
    text = body.decode("utf-8", "replace")
    pages = [text[i : i + _PAGE_BYTES] for i in range(0, max(len(text), 1), _PAGE_BYTES)]
    out = []  # (page, span_index, kind, text, bbox)
    for pno, ptext in enumerate(pages):
        if not ptext:
            continue
        d = hashlib.blake2b(ptext.encode("utf-8"), digest_size=8).digest()
        y = 760.0 - d[0] / 8.0
        head = ptext[:40].strip()
        si = 0
        if head:
            out.append((pno, si, "heading", head, (72.0, y, 72.0 + 6.0 * len(head), y + 14.0)))
            si += 1
        rest = ptext[40:]
        for ci in range(0, len(rest), _SPAN_CHARS):
            chunk = rest[ci : ci + _SPAN_CHARS].strip()
            if not chunk:
                continue
            yy = y - 20.0 * si
            out.append((pno, si, "body", chunk, (72.0, yy, 540.0, yy + 12.0)))
            si += 1
    return out


class PdfLayoutActor:
    """Actor-pool layout-parse stage (parser state loads once per actor; a
    real impl opens the codec here). flat_map shape: one input doc row →
    many output span rows."""

    def __init__(self) -> None:
        self.parsed = 0
        self.failed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pdfs = batch.column("pdf").to_pylist()
        o_doc, o_page, o_si, o_kind, o_text = [], [], [], [], []
        o_bb: list[tuple[float, float, float, float]] = []
        for doc_id, payload in zip(ids, pdfs):
            try:
                spans = _fake_layout_parse(payload or b"")
                self.parsed += 1
            except ValueError:
                self.failed += 1  # junk payload → zero spans, counted
                continue
            for pno, si, kind, text, bb in spans:
                o_doc.append(doc_id)
                o_page.append(pno)
                o_si.append(si)
                o_kind.append(kind)
                o_text.append(text)
                o_bb.append(bb)
        bb = np.asarray(o_bb, dtype=np.float32).reshape(-1, 4)
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.int64()),
                "page": pa.array(o_page, pa.int32()),
                "span_index": pa.array(o_si, pa.int32()),
                "kind": pa.array(o_kind, pa.string()),
                "text": pa.array(o_text, pa.string()),
                "x0": pa.array(bb[:, 0], pa.float32()),
                "y0": pa.array(bb[:, 1], pa.float32()),
                "x1": pa.array(bb[:, 2], pa.float32()),
                "y1": pa.array(bb[:, 3], pa.float32()),
            },
            schema=SPAN_SCHEMA,
        )


def pdf_layout_spans(sf_dir: str) -> "ray.data.Dataset":
    """QA pipeline: synth pdf from documents → actor-pool layout parse.
    Large binary rows → small batches; spans (small rows) flow downstream."""
    import os

    import ray.data

    from metareadability_ray.util import auto_actor_concurrency

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pdfs = ds.map_batches(synth_pdf_batch, batch_format="pyarrow", zero_copy_batch=True)
    return pdfs.map_batches(
        PdfLayoutActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=auto_actor_concurrency(cap=4),
        max_restarts=0,
    )
