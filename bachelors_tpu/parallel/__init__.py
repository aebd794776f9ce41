from .mesh import field_spec, make_mesh, shard_state
from .sharded import make_ensemble_stepper, make_sharded_stepper
from .topology import Topology
