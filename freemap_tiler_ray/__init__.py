"""freemap_tiler_ray — a Ray-Data-native raster tile-pyramid + spatial-join
engine with the query/data-processing capabilities of
FreemapSlovakia/freemap-tiler (reference at /root/reference, Rust),
re-expressed as streaming `ray.data.Dataset` pipelines over zero-copy
Arrow batches. Not a port: see SURVEY.md for the operator-by-operator
mapping and BASELINE.md for the measurement protocol.

Layout:
  tilemath / geo / resample / codecs / jpeg  — pure-numpy kernels (no Ray)
  raster            — synthetic scene fixtures + in-memory raster model
  sources/          — readers: raster windows, documents/spans, MBTiles
  stages/           — map_batches / actor-pool stage implementations
  pipelines/        — end-to-end pipelines (tiler, checkpoint/resume)
  state/            — limits aggregate, per-partition metrics/lineage

Nothing in this package calls ray.init()/ray.shutdown(); sessions are
owned by bench.py, CLI entry points and the pytest fixture only.
"""

from . import memtune as _memtune
from . import ray_patches as _ray_patches

_memtune.apply()
_ray_patches.apply()
