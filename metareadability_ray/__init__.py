"""metareadability_ray — a Ray-Data-native news-metadata extraction engine.

Brand-new engine (NOT a port) with the capabilities of
``bcampbell/metareadability``: headline / publication-date / author extraction
over Common-Crawl-style Parquet page tables, expressed as
``ray.data.read_parquet → map_batches`` over zero-copy Arrow batches with an
actor pool holding the precompiled signal tables, explicit url-hash
partitioning, per-partition checkpoint manifests + lineage/metrics sidecars,
and deterministic sorted Parquet output.

The per-document kernel lives in the sibling ``oracle`` package (the
byte-identity reference); this package is the distributed engine around it.

Never calls ``ray.init()`` — sessions are owned by the driver / bench / tests.
"""

__version__ = "0.1.0"
