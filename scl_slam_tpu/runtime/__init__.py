from .fleet import FleetMapper
from .mapper import Mapper
from .state import MapperState, make_state

__all__ = ["FleetMapper", "Mapper", "MapperState", "make_state"]
