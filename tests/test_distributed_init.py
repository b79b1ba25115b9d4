"""Unit tests for the --distributed 7-tuple -> jax.distributed translation
(/root/reference/main.py:19-43: WORLD_SIZE = NODES x DEVICES_PER_NODE with one
single-GPU process per device; here one JAX process per node owns every local
chip, so the process world is NODES)."""

from dualsuperreslearningforsemseg_tpu.parallel import distributed_init_kwargs


def _tuple(**overrides):
    base = dict(MASTER_ADDR='10.0.0.1', MASTER_PORT='29500', NODES=4,
                DEVICES_PER_NODE=8, BACKEND='nccl', INIT_METHOD=' ', NODE_ID=2)
    base.update(overrides)
    return base


def test_maps_nodes_to_process_count_and_node_id_to_process_id():
    kwargs, _ = distributed_init_kwargs(_tuple())
    assert kwargs == dict(coordinator_address='10.0.0.1:29500',
                          num_processes=4, process_id=2)


def test_string_typed_nodes_are_coerced():
    kwargs, _ = distributed_init_kwargs(_tuple(NODES='3', NODE_ID='0'))
    assert kwargs['num_processes'] == 3 and kwargs['process_id'] == 0


def test_backend_choice_warns_but_does_not_fail():
    for backend in ('nccl', 'gloo', 'mpi'):
        _, cautions = distributed_init_kwargs(_tuple(BACKEND=backend))
        assert any(backend in c for c in cautions), \
            "expected a caution naming the ignored backend '{}'".format(backend)
    _, cautions = distributed_init_kwargs(_tuple(BACKEND='xla'))
    assert not any('backend' in c.lower() for c in cautions)


def test_init_method_env_sentinel_is_silent():
    # The reference treats ' ' as "use env:// rendezvous" (utils.py:172-173);
    # both spellings are the default here and must not warn.
    for init_method in (' ', '', 'env://', None):
        _, cautions = distributed_init_kwargs(_tuple(INIT_METHOD=init_method))
        assert not any('INIT_METHOD' in c for c in cautions)
    _, cautions = distributed_init_kwargs(_tuple(INIT_METHOD='tcp://10.0.0.1:1234'))
    assert any('INIT_METHOD' in c for c in cautions)


def test_devices_per_node_does_not_change_process_world():
    kwargs_a, _ = distributed_init_kwargs(_tuple(DEVICES_PER_NODE=1))
    kwargs_b, _ = distributed_init_kwargs(_tuple(DEVICES_PER_NODE=16))
    assert kwargs_a == kwargs_b
