from . import io  # noqa: F401
from .params import (  # noqa: F401
    CNNSConfig,
    HNSWConfig,
    NNDescentConfig,
    NSGBuildConfig,
    NSGSearchConfig,
    Parameters,
)
