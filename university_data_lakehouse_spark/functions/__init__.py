from .keys import surrogate_key  # noqa: F401
from .money import dsum, davg, dsum_expr  # noqa: F401
from .textfns import tokens, shingles  # noqa: F401
from .vector import as_double_vec, dot, norm, cosine  # noqa: F401
