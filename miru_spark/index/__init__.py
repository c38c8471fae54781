from .build import IndexPaths, build_index, finalize_index  # noqa: F401
