from .codec import (PMTilesReader, build_pmtiles, serialize_directory,
                    deserialize_directory, tileid_col, tileid_to_zxy,
                    zxy_to_tileid, zxy_to_tileid_np)

__all__ = ["PMTilesReader", "build_pmtiles", "serialize_directory",
           "deserialize_directory", "tileid_col", "tileid_to_zxy",
           "zxy_to_tileid", "zxy_to_tileid_np"]
