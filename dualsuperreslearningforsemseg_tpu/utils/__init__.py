from .logging import (INFO, CAUTION, FATAL, OverridePrintWithTQDMWriteAndLog,
                      ConditionalContextManager)
from .timers import timeit, timethis, makeSecondsPretty
from .fsutil import (INVALID_FILENAME_CHARS, isInvalidFilename, hasExtension,
                     getFilesWithExtension, swapTupleValues, check_version,
                     prevent_system_sleep)
from .backend import pinned_platform, pinned_exactly, resolve_backend
from .validators import (ValidateDatasetNameAndSplit,
                         ValidateDatasetNameSplitAndIndex,
                         ValidateDistributedTrainingOptions)

__all__ = [
    'INFO', 'CAUTION', 'FATAL', 'OverridePrintWithTQDMWriteAndLog',
    'ConditionalContextManager', 'timeit', 'timethis', 'makeSecondsPretty',
    'INVALID_FILENAME_CHARS', 'isInvalidFilename', 'hasExtension',
    'getFilesWithExtension', 'swapTupleValues', 'check_version',
    'prevent_system_sleep', 'pinned_platform', 'pinned_exactly',
    'resolve_backend',
    'ValidateDatasetNameAndSplit',
    'ValidateDatasetNameSplitAndIndex', 'ValidateDistributedTrainingOptions',
]
