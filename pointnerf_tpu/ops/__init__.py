from .grid import GridMeta, PointGrid, build_grid, grid_meta
from .pe import pe_dim, positional_encoding
from .query import QueryResult, knn_query, query_points, select_shading_points
