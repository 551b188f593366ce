from cudacam_tpu.engine.engine import CannyEngine
from cudacam_tpu.engine.sharded_engine import ShardedCannyEngine

__all__ = ["CannyEngine", "ShardedCannyEngine"]
