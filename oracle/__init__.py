"""Vendored single-document oracle — the NORMATIVE reference for this repo.

The public reference (`bcampbell/metareadability`) is unavailable in this
sandbox (`/root/reference/` is empty — see SURVEY.md §0), so this package is
the byte-identity reference mandated by BASELINE.json ("byte-identical
extracted text per url"): a small, pure-Python, deterministic, single-document
implementation of SURVEY.md Appendix A (headline / pubdate / authors
extraction by DOM-heuristic candidate scoring).

Rules of this package:
  * Pure Python + stdlib only. No Ray, no Arrow, no pandas, no lxml.
  * Every normalization / scoring / rendering choice is pinned here and in
    SURVEY.md Appendix A; the Ray engine imports THESE functions so parity is
    by construction, and any alternative engine implementation must be
    byte-identical to this one (enforced by tests/test_parity*.py).
  * Deterministic: no randomness, no wall-clock reads, no environment reads.

Spec IDs (SURVEY.md §2): MR-X0..MR-X10 live here.
"""

from oracle.extract import extract, ExtractResult
from oracle.signals import SIGNALS_VERSION

__all__ = ["extract", "ExtractResult", "SIGNALS_VERSION"]
