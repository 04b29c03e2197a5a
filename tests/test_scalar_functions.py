"""Unit coverage for the vectorized scalar-function library (§2.8)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from metareadability_ray.functions import scalars as S


def test_stable_hash64_deterministic_int64():
    a = np.asarray(["a", "b", "a", ""], dtype=object)
    h1, h2 = S.stable_hash64(a), S.stable_hash64(a)
    assert h1.dtype == np.int64
    assert (h1 == h2).all()
    assert h1[0] == h1[2] and h1[0] != h1[1]


def test_md5_hex_null_propagates():
    out = S.md5_hex(pa.array([b"abc", None, "x"]))
    assert out[0].as_py() == hashlib.md5(b"abc").hexdigest()
    assert out[1].as_py() is None
    assert out[2].as_py() == hashlib.md5(b"x").hexdigest()


def test_norm_ws():
    out = S.norm_ws(pa.array(["  a \t b\n\nc ", "", None]))
    assert out.to_pylist() == ["a b c", "", None]


def test_token_count():
    out = S.token_count(pa.array(["one two  three", "", None, " x "]))
    assert out.to_pylist() == [3, 0, None, 1]


def test_json_get_int():
    arr = pa.array(['{"k": 3, "z": 9}', '{"z": 1}', None, '{"k": -12}'])
    assert S.json_get_int(arr, "k").to_pylist() == [3, None, None, -12]
    assert S.json_get_int(arr, "z").to_pylist() == [9, 1, None, None]


def test_url_parts():
    urls = pa.array(
        [
            "https://news.example.com:8080/2021/03/05/big-story.html?ref=rss#top",
            "http://a.example/",
            "not a url",
        ]
    )
    assert S.url_host(urls).to_pylist() == ["news.example.com", "a.example", None]
    assert S.url_path(urls).to_pylist() == ["/2021/03/05/big-story.html", "/", "/"]
    assert S.url_slug(urls).to_pylist()[0] == "big-story"
    d = S.url_date(urls)
    assert d[0].as_py() == {"y": "2021", "m": "03", "d": "05"}
    assert d[1].as_py() is None


def test_url_date_rejects_non_date_numbers():
    d = S.url_date(pa.array(["https://x.example/1234/99/99/story", "https://x.example/2021/3/5"]))
    assert d[0].as_py() is None  # 1234 is not a plausible year
    assert d[1].as_py() == {"y": "2021", "m": "3", "d": "5"}
