"""Pipeline configuration mirroring the reference CLI surface
(/root/reference/src/args.rs:13-70). Every flag has a direct field; the
extension surface beyond this is the Ray-native one (every stage is a
map_batches UDF)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class TilerConfig:
    scene_spec_path: str            # args.rs source_file (our scene .npy)
    out_dir: str                    # checkpoint/shard layout root
    target_file: str | None = None  # final MBTiles (None = parquet only)
    max_zoom: int = 6               # args.rs:38-40
    resume: bool = False            # args.rs:24-26 --continue-file
    bounding_polygon: object = None  # (N,2) EPSG:3857 ring or geojson path (args.rs:41-43)
    tile_size: int = 256            # args.rs:44-46
    fmt: str = "png"                # args.rs:51-54 (jpeg|png)
    jpeg_quality: int = 85          # args.rs:55-57
    warp_zoom_offset: int = 3       # args.rs:59-61
    insert_empty: bool = True       # args.rs:67-69
    kernel: str = "lanczos3"        # warp.rs:70 GRA_Lanczos / processor.rs:286 Lanczos3
    concurrency: int | None = None  # args.rs:48-50 --num-threads analog (warp actor pool)
    checkpoint_levels: bool = True  # write each level to parquet (resumable) vs in-memory

    @property
    def effective_offset(self) -> int:
        return min(self.warp_zoom_offset, self.max_zoom)
