"""Framework-wide constants (parity with /root/reference/consts.py:1-2)."""

NUM_RGB_CHANNELS = 3
IMAGE_FILE_EXTENSIONS = ('.png', '.jpg', '.jpeg', '.bmp')
