"""NumPy float64 reference-spec implementations.

These modules are the *numeric specification* for the TPU framework: they
re-derive, in plain NumPy/SciPy, the algorithms the reference project obtains
from scikit-image / PyWavelets (neither of which is a dependency here).  The
JAX/Pallas device code in ``mdx.core`` and ``mdx.ops`` is golden-tested
against this package, and ``bench.py`` uses it as the single-image CPU
baseline that the TPU path must beat.

Formula provenance is cited per-function to the reference repo
(``/root/reference``) as ``file:line`` so parity can be audited.
"""
