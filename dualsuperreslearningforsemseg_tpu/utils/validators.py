"""argparse validator Actions (parity: /root/reference/utils.py:101-180).

The distributed validator keeps the reference's 7-argument CLI shape
(MASTER_ADDR MASTER_PORT NODES DEVICES_PER_NODE BACKEND INIT_METHOD NODE_ID,
/root/reference/main.py:118) but the backend choice is advisory only: on TPU
the fabric is owned by XLA (ICI/DCN collectives), so gloo/mpi/nccl are
accepted and ignored with a warning at train time.
"""

import argparse


class ValidateDatasetNameAndSplit(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        datasets = self.const
        dataset, split = values[0].casefold(), values[1].casefold()

        if dataset not in datasets:
            raise ValueError("Unknown dataset! Supported datasets are: {:s}.".format(', '.join(datasets)))

        splits = datasets[dataset]['splits']
        if split not in splits:
            raise ValueError("Unknown dataset split! Supported splits are: {:s}.".format(', '.join(splits)))

        setattr(namespace, self.dest, values)


class ValidateDatasetNameSplitAndIndex(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        datasets = self.const
        dataset, split, starting_index = values[0].casefold(), values[1].casefold(), values[2]

        if dataset not in datasets:
            raise ValueError("Unknown dataset! Supported datasets are: {:s}.".format(', '.join(datasets)))

        splits = datasets[dataset]['splits']
        if split not in splits:
            raise ValueError("Unknown dataset split! Supported splits are: {:s}.".format(', '.join(splits)))

        if not starting_index.isnumeric():
            raise ValueError("Starting index must be an integer greater or equal to 0!")

        starting_index = int(starting_index)
        if starting_index < 0:
            raise ValueError("Starting index must be an integer greater or equal to 0!")

        setattr(namespace, self.dest, [dataset, split, starting_index])


class ValidateDistributedTrainingOptions(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        backends = self.const
        master_addr, master_port, nodes, devices_per_node, backend, init_method, node_id = \
            values[0], values[1], values[2], values[3], values[4].casefold(), values[5].casefold(), values[6]

        if not master_port.isnumeric():
            raise ValueError("Master port must be a positive integer!")
        master_port = int(master_port)

        if not nodes.isnumeric():
            raise ValueError("Nodes must be a positive integer!")
        nodes = int(nodes)
        if nodes < 1:
            raise ValueError("Nodes must be greater than 0!")

        if not devices_per_node.isnumeric():
            raise ValueError("Devices per node must be a positive integer!")
        devices_per_node = int(devices_per_node)
        if devices_per_node < 1:
            raise ValueError("Devices per node must be greater than 0!")

        if backend not in backends:
            raise ValueError("Supported backends must be one of: [{:s}]!".format(', '.join(backends)))

        if init_method == ' ':
            init_method = None

        if not node_id.isnumeric():
            raise ValueError("Node id must be an integer greater or equal to 0!")
        node_id = int(node_id)

        # Stored as the mapping parallel.distributed_init_kwargs consumes.
        setattr(namespace, self.dest, dict(
            MASTER_ADDR=master_addr, MASTER_PORT=master_port, NODES=nodes,
            DEVICES_PER_NODE=devices_per_node, BACKEND=backend,
            INIT_METHOD=init_method, NODE_ID=node_id))
