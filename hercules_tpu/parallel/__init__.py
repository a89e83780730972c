from .partition import ShardedTables, shard_tables
from .sharded import make_sharded_step, run_sharded, gather_global
