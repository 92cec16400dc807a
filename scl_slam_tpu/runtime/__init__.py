from .mapper import Mapper
from .state import MapperState, make_state

__all__ = ["Mapper", "MapperState", "make_state"]
