from .suite import ORACLES, QUERIES, load_table  # noqa: F401
from . import pipeline  # noqa: F401  (registers training-data ops)
from . import solr_extras  # noqa: F401  (term vectors, interval/heatmap/uniqueBlock facets)
from . import clustering  # noqa: F401  (k-means, ClusteringComponent role)
from . import ranges  # noqa: F401  (RangeField relation queries)
from . import dv_stats  # noqa: F401  (DocValuesStats collector)
from . import ipfields  # noqa: F401  (InetAddressPoint/Range queries)
from . import bbox  # noqa: F401  (BBoxStrategy + overlap-ratio relevancy)
from ..streaming import mlstreams  # noqa: F401  (featuresSelection/textLogit)
