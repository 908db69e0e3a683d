from .sharded import (
    row_mesh,
    padded_rows,
    sharded_assemble,
    sharded_matvec,
    slab_to_flat,
    flat_to_slab,
)

__all__ = [
    "row_mesh",
    "padded_rows",
    "sharded_assemble",
    "sharded_matvec",
    "slab_to_flat",
    "flat_to_slab",
]
