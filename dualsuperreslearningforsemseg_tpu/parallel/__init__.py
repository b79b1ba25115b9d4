from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_batch, replicate, is_master_rank, pad_batch_to_shards,
                   count_valid_fn, initialize_distributed,
                   distributed_init_kwargs, rendezvous_barrier,
                   align_first_dispatch,
                   spatial_axis_size, data_shards_per_process)

__all__ = ['make_mesh', 'batch_sharding', 'replicated_sharding', 'shard_batch',
           'pad_batch_to_shards', 'count_valid_fn',
           'replicate', 'is_master_rank', 'initialize_distributed',
           'distributed_init_kwargs', 'rendezvous_barrier',
           'align_first_dispatch',
           'spatial_axis_size', 'data_shards_per_process']
