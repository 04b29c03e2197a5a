"""Full-value checks for rows-only queries against committed snapshots.

The driver gate row-counts these (no SQL oracle exists); the snapshots in
tests/expected/ pin every value at sf0.001. Regenerate intentionally with
scripts/gen_expected.py after a semantic change — never to make a red test
green by accident.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scripts.gen_expected import SF_DIR, SNAPSHOT_QUERIES, canonical

EXPECTED_DIR = os.path.join(os.path.dirname(__file__), "expected")


@pytest.mark.parametrize("name", SNAPSHOT_QUERIES)
def test_snapshot_values_match(ray_session, name):
    from metareadability_ray.qa import REGISTRY

    res = REGISTRY[name].fn(SF_DIR)
    got = canonical(
        res
        if isinstance(res, pa.Table)
        else pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))
    )
    want = pq.read_table(os.path.join(EXPECTED_DIR, f"{name}.parquet"))
    assert got.num_rows == want.num_rows, f"{name}: row count changed"
    assert got.column_names == want.column_names
    for col in want.column_names:
        g = got.column(col).to_pylist()
        w = want.column(col).to_pylist()
        bad = [i for i, (x, y) in enumerate(zip(g, w)) if x != y]
        assert not bad, f"{name}.{col}: {len(bad)} value diffs, first at row {bad[0]}"
