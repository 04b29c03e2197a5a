"""Determinism properties (SURVEY.md §5.3): output must be byte-identical
across actor-pool sizes and block layouts, and the oracle must never raise
on arbitrary byte garbage (crash-safety fuzz, seeded)."""

import random

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    from fixtures.gen import generate

    out = tmp_path_factory.mktemp("det_corpus")
    return generate(str(out), n_rows=150, seed=77)


def _extract_table(ray_session, pages, concurrency, num_partitions=5, blocks=None):
    import ray

    from metareadability_ray.pipelines.flagship import build_extraction_dataset

    ds = build_extraction_dataset(
        [pages],
        num_partitions=num_partitions,
        concurrency=concurrency,
        batch_size=32,
        override_num_blocks=blocks,
    )
    import pyarrow as pa

    tabs = [ray.get(r) for r in ds.to_arrow_refs()]
    t = pa.concat_tables([x for x in tabs if x.num_rows])
    return t.select(["url", "headline", "pubdate", "authors", "text"]).sort_by("url")


def test_identical_across_concurrency_and_blocks(ray_session, small_corpus):
    """Same bytes whether 1 or 3 actors, 2 or 8 input blocks — the dedup
    tie-break and sort rules make block order irrelevant."""
    a = _extract_table(ray_session, small_corpus["pages"], concurrency=1, blocks=2)
    b = _extract_table(ray_session, small_corpus["pages"], concurrency=3, blocks=8)
    assert a.equals(b)


def test_matches_expected_fixture(ray_session, small_corpus):
    a = _extract_table(ray_session, small_corpus["pages"], concurrency=2)
    exp = pq.read_table(small_corpus["expected"]).sort_by("url")
    assert a.equals(exp)


def test_oracle_never_raises_on_fuzz():
    """Seeded byte-fuzz: truncations, splices, random garbage, nested bombs —
    extract() must always return a result, never raise (MR-X1/X2 contract)."""
    import datetime as dt

    from oracle import extract

    rng = random.Random(4242)
    base = (
        b"<!DOCTYPE html><html><head><title>T | Site</title>"
        b'<meta property="article:published_time" content="2021-03-04T05:06:07Z">'
        b'</head><body><h1 class="headline">Some Headline Here</h1>'
        b'<p class="byline">By Jane Doe and John Smith</p><p>body text</p></body></html>'
    )
    ts = dt.datetime(2022, 1, 1)
    for i in range(300):
        mode = rng.randrange(5)
        if mode == 0:  # truncate
            payload = base[: rng.randrange(len(base))]
        elif mode == 1:  # splice random bytes in
            pos = rng.randrange(len(base))
            payload = base[:pos] + bytes(rng.randrange(256) for _ in range(rng.randrange(30))) + base[pos:]
        elif mode == 2:  # pure garbage
            payload = bytes(rng.randrange(256) for _ in range(rng.randrange(500)))
        elif mode == 3:  # deep nesting + unclosed tags
            payload = b"<div " * rng.randrange(200) + base + b"</p>" * rng.randrange(200)
        else:  # shuffle chunks
            chunks = [base[j : j + 16] for j in range(0, len(base), 16)]
            rng.shuffle(chunks)
            payload = b"".join(chunks)
        r = extract(payload, f"https://x.com/2021/03/04/some-headline-{i}.html", ts)
        assert isinstance(r.headline, str)
        assert isinstance(r.authors, list)
