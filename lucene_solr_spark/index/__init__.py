from .builder import IndexTables, assign_docids, build_index  # noqa: F401
from .check import CheckStatus, check_index, check_segment_index  # noqa: F401
from .replication import (  # noqa: F401
    fetch_index,
    publish_file_list,
    replication_details,
)
from .segments import (  # noqa: F401
    SegmentIndex,
    build_segment_index,
    create_snapshot,
    keep_last_n_snapshots,
    list_snapshots,
    open_snapshot,
    release_snapshot,
)
