from .fault import (
    ElasticSupervisor,
    FaultInjector,
    HealthMonitor,
    Heartbeat,
    StragglerDetected,
    TrainingDiverged,
    device_healthcheck,
)
from .mesh import make_mesh, shard_variables, spec_for_variables
from .scaling import (collective_stats, measure_scaling,
                      run_multiprocess_scaling)

__all__ = [
    "make_mesh", "shard_variables", "spec_for_variables",
    "collective_stats", "measure_scaling", "run_multiprocess_scaling",
    "ElasticSupervisor", "FaultInjector", "HealthMonitor", "Heartbeat",
    "StragglerDetected", "TrainingDiverged", "device_healthcheck",
]
