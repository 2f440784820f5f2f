from .normalize import norm_numeric, norm_text  # noqa: F401
from .vectors import cosine_sim, l2_norm  # noqa: F401
