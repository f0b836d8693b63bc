from .sharded import (  # noqa: F401
    make_mesh,
    compress_sharded,
    compress_sharded_device,
    decompress_sharded,
    decompress_sharded_device,
)
