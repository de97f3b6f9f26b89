from financial_rag_system_tpu.parallel.mesh import (
    AXIS_CORPUS,
    AXIS_DATA,
    create_mesh,
    local_mesh,
)
