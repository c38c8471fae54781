from .build import (  # noqa: F401
    IndexPaths,
    build_index,
    finalize_index,
    read_lineage,
    snapshots,
)
from .compact import (  # noqa: F401
    compact_index,
    compact_removals,
)
from .retention import (  # noqa: F401
    get_retention,
    retention_pid_floor,
    set_retention,
)
from .removals import (  # noqa: F401
    read_removed,
    remove_docs,
    remove_urls,
    restore_docs,
)
from .sync import sync_index  # noqa: F401
