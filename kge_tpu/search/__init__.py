from kge_tpu.search.search import SearchJob
from kge_tpu.search.auto import AutoSearchJob
from kge_tpu.search.manual import GridSearchJob, ManualSearchJob
from kge_tpu.search.ax import AxSearchJob
