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

__all__ = [
    "make_mesh", "shard_variables", "spec_for_variables",
    "ElasticSupervisor", "FaultInjector", "HealthMonitor", "Heartbeat",
    "StragglerDetected", "TrainingDiverged", "device_healthcheck",
]
