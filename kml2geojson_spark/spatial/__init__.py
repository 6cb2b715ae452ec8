from .cells import (
    MAX_RES,
    cell_encode_np,
    cell_decode_np,
    cell_parent_np,
    cell_bounds_np,
    cell_kring_np,
    cell_encode_col,
    cell_encode_sql,
    cell_res_col,
    cell_parent_col,
)
from .ops import (
    encode_points,
    cover_cells_rect,
    polygon_cover,
    pip_join,
    knn_join,
    coverage_fractions,
    tile_assignments,
)
from .salted import salted_join, hot_keys

__all__ = [
    "MAX_RES",
    "cell_encode_np",
    "cell_decode_np",
    "cell_parent_np",
    "cell_bounds_np",
    "cell_kring_np",
    "cell_encode_col",
    "cell_encode_sql",
    "cell_res_col",
    "cell_parent_col",
    "encode_points",
    "cover_cells_rect",
    "polygon_cover",
    "pip_join",
    "knn_join",
    "coverage_fractions",
    "tile_assignments",
    "salted_join",
    "hot_keys",
]
