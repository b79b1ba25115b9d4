from .dsrl import DSRL, FeatureExtractor, SSSRDecoder, SISRDecoder, FeatureTransformer
from .resnet import ResNet101, Bottleneck
from .aspp import ASPP
from .norm import TorchBatchNorm
from .schedulers import PolynomialLR
from .state_dict import state_dict, load_state_dict, flatten_variables, count_params
from .host_init import init_model_host, host_init_context, host_cpu_device

__all__ = ['DSRL', 'FeatureExtractor', 'SSSRDecoder', 'SISRDecoder',
           'FeatureTransformer', 'ResNet101', 'Bottleneck', 'ASPP',
           'TorchBatchNorm', 'PolynomialLR', 'state_dict', 'load_state_dict',
           'flatten_variables', 'count_params', 'init_model_host',
           'host_init_context', 'host_cpu_device']
