from .normalize import normalize, normalize_phase1, normalize_phase2  # noqa: F401
from .validate import CubeValidator  # noqa: F401
