from .build import IndexPaths, build_index, finalize_index  # noqa: F401
from .removals import (  # noqa: F401
    read_removed,
    remove_docs,
    remove_urls,
    restore_docs,
)
