from . import checksum, knn, mercator, pip, resample  # noqa: F401
