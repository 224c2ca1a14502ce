from . import databin, ppm, ripmap  # noqa: F401
