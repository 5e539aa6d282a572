"""Model zoo — in a dense linear-algebra framework, "models" are matrices.

The reference has no ML/model layer (SURVEY.md: "the 'models' are
matrices"); the equivalents of model constructors are the deterministic
matrix generators used by miniapps and tests.  Re-exported here so the
conventional ``models/`` entry point resolves to them.
"""

from ..matrix.util import (random, random_hermitian,
                           random_hermitian_positive_definite,
                           random_lower_triangular,
                           random_upper_triangular)

__all__ = [
    "random",
    "random_hermitian",
    "random_hermitian_positive_definite",
    "random_lower_triangular",
    "random_upper_triangular",
]
