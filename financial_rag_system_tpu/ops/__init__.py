from financial_rag_system_tpu.ops.topk import masked_topk, masked_topk_pallas, masked_topk_xla
