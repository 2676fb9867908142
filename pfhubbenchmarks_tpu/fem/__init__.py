from pfhubbenchmarks_tpu.fem import quadrature as quadrature
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid as CrossedTriGrid
