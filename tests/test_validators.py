"""Unit tests for the argparse validator Actions.

Pins the CLI validation contract (reference: /root/reference/utils.py:101-180)
at the Action level so the slow CLI e2e suite isn't the only coverage.
"""

import argparse
import re

import pytest

from dualsuperreslearningforsemseg_tpu.utils.validators import (
    ValidateDatasetNameAndSplit, ValidateDatasetNameSplitAndIndex,
    ValidateDistributedTrainingOptions)

DATASETS = {'cityscapes': {'splits': ('train', 'val', 'test')}}
BACKENDS = ('gloo', 'mpi', 'nccl')


def _parser():
    p = argparse.ArgumentParser()
    p.add_argument('--ds2', nargs=2, const=DATASETS, action=ValidateDatasetNameAndSplit)
    p.add_argument('--ds3', nargs=3, const=DATASETS, action=ValidateDatasetNameSplitAndIndex)
    p.add_argument('--dist', nargs=7, const=BACKENDS, action=ValidateDistributedTrainingOptions)
    return p


def test_dataset_name_and_split_ok():
    ns = _parser().parse_args(['--ds2', 'Cityscapes', 'VAL'])
    assert ns.ds2 == ['Cityscapes', 'VAL']  # stored raw, validated casefolded


@pytest.mark.parametrize('pair, msg', [
    (['nope', 'val'], 'Unknown dataset!'),
    (['cityscapes', 'nope'], 'Unknown dataset split!'),
])
def test_dataset_name_and_split_rejects(pair, msg):
    with pytest.raises(ValueError, match=re.escape(msg)):
        _parser().parse_args(['--ds2', *pair])


def test_dataset_split_index_parses_and_casefolds():
    ns = _parser().parse_args(['--ds3', 'CityScapes', 'Val', '7'])
    assert ns.ds3 == ['cityscapes', 'val', 7]


@pytest.mark.parametrize('idx', ['-1', 'x', '1.5'])
def test_dataset_split_index_rejects(idx):
    with pytest.raises(ValueError, match='Starting index'):
        _parser().parse_args(['--ds3', 'cityscapes', 'val', idx])


def test_distributed_tuple_parses_to_mapping():
    ns = _parser().parse_args(['--dist', 'host', '1234', '2', '4', 'NCCL', ' ', '1'])
    assert ns.dist == dict(MASTER_ADDR='host', MASTER_PORT=1234, NODES=2,
                           DEVICES_PER_NODE=4, BACKEND='nccl',
                           INIT_METHOD=None, NODE_ID=1)


def test_distributed_keeps_explicit_init_method():
    ns = _parser().parse_args(['--dist', 'h', '1', '1', '1', 'gloo', 'tcp://h:1', '0'])
    assert ns.dist['INIT_METHOD'] == 'tcp://h:1'


@pytest.mark.parametrize('tup, msg', [
    (['h', 'xx', '1', '1', 'gloo', ' ', '0'], 'Master port'),
    (['h', '1', 'x', '1', 'gloo', ' ', '0'], 'Nodes must be a positive'),
    (['h', '1', '0', '1', 'gloo', ' ', '0'], 'Nodes must be greater'),
    (['h', '1', '1', 'x', 'gloo', ' ', '0'], 'Devices per node must be a positive'),
    (['h', '1', '1', '0', 'gloo', ' ', '0'], 'Devices per node must be greater'),
    (['h', '1', '1', '1', 'bad', ' ', '0'], 'Supported backends'),
    (['h', '1', '1', '1', 'gloo', ' ', '-1'], 'Node id'),
])
def test_distributed_rejects(tup, msg):
    with pytest.raises(ValueError, match=msg):
        _parser().parse_args(['--dist', *tup])
