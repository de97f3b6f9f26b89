from financial_rag_system_tpu.utils.config import Config, get_config
from financial_rag_system_tpu.utils.hashing import cache_key, point_id
