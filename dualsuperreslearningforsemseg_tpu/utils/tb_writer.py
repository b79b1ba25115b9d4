"""TensorBoard summary writer (scalars, text, images) without torch.

The reference logs through ``torch.utils.tensorboard.SummaryWriter``
(/root/reference/command_handlers/train_or_resume.py:176-177,498-510).  This
implementation uses the ``tensorboard`` package's own event-file writer and
protobufs directly, so runs remain viewable in standard TensorBoard while the
runtime stays torch-free.  Falls back to a no-op JSONL logger if tensorboard
is unavailable.
"""

import io
import json
import os
import time

import numpy as np

try:
    from tensorboard.compat.proto.event_pb2 import Event
    from tensorboard.compat.proto.summary_pb2 import Summary, SummaryMetadata
    from tensorboard.compat.proto.tensor_pb2 import TensorProto
    from tensorboard.compat.proto.tensor_shape_pb2 import TensorShapeProto
    from tensorboard.summary.writer.event_file_writer import EventFileWriter
    _HAVE_TB = True
except Exception:  # pragma: no cover
    _HAVE_TB = False


class SummaryWriter:
    """API-compatible subset of torch's SummaryWriter used by the engine:
    add_scalar, add_text, add_image, flush, close; usable as a context
    manager (reference uses it under ConditionalContextManager)."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        if _HAVE_TB:
            self._writer = EventFileWriter(log_dir)
        else:  # pragma: no cover
            self._writer = None
            self._jsonl = open(os.path.join(log_dir, 'events.jsonl'), 'a')

    def _add_event(self, summary, step):
        if self._writer is None:  # pragma: no cover
            return
        event = Event(wall_time=time.time(), step=int(step), summary=summary)
        self._writer.add_event(event)

    def add_scalar(self, tag, value, global_step):
        if self._writer is None:  # pragma: no cover
            self._jsonl.write(json.dumps({'tag': tag, 'value': float(value),
                                          'step': int(global_step)}) + '\n')
            return
        summary = Summary(value=[Summary.Value(tag=tag, simple_value=float(value))])
        self._add_event(summary, global_step)

    def add_text(self, tag, text, global_step):
        if self._writer is None:  # pragma: no cover
            self._jsonl.write(json.dumps({'tag': tag, 'text': text,
                                          'step': int(global_step)}) + '\n')
            return
        metadata = SummaryMetadata(
            plugin_data=SummaryMetadata.PluginData(plugin_name='text'))
        tensor = TensorProto(
            dtype='DT_STRING',
            string_val=[text.encode('utf-8')],
            tensor_shape=TensorShapeProto(dim=[TensorShapeProto.Dim(size=1)]))
        summary = Summary(value=[Summary.Value(tag=tag + '/text_summary',
                                               metadata=metadata, tensor=tensor)])
        self._add_event(summary, global_step)

    def add_image(self, tag, img_chw, global_step):
        """img_chw: (3, H, W) uint8 (reference passes the numba viz output)."""
        if self._writer is None:  # pragma: no cover
            return
        from PIL import Image as PILImage
        arr = np.asarray(img_chw)
        if arr.ndim == 3 and arr.shape[0] in (1, 3):
            arr = np.transpose(arr, (1, 2, 0))
        if arr.ndim == 3 and arr.shape[2] == 1:
            # PIL cannot encode a trailing singleton channel — grayscale
            # encodes as a 2-D 'L' image.
            arr = arr[..., 0]
        buf = io.BytesIO()
        PILImage.fromarray(arr.astype(np.uint8)).save(buf, format='PNG')
        image = Summary.Image(height=arr.shape[0], width=arr.shape[1],
                              colorspace=arr.shape[2] if arr.ndim == 3 else 1,
                              encoded_image_string=buf.getvalue())
        summary = Summary(value=[Summary.Value(tag=tag, image=image)])
        self._add_event(summary, global_step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
        elif hasattr(self, '_jsonl'):  # pragma: no cover
            self._jsonl.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, exc_traceback):
        self.close()
