"""Wall-clock timers (parity: /root/reference/utils.py:18-51)."""

from datetime import datetime

_starttimes_dict = {'default': datetime.now()}


def timeit(message=None, label='default'):
    global _starttimes_dict
    difftime = None
    now = datetime.now()
    if label in _starttimes_dict and message:
        difftime = now - _starttimes_dict[label]
        print("{0:s}: {1:.3f} secs".format(label, difftime.total_seconds()))
    _starttimes_dict[label] = now
    return difftime


def makeSecondsPretty(time_elapsed):
    SECS_BOUND_WITH_UNIT = [(86400., 'days'), (3600., 'hrs'), (60., 'mins')]
    unit = 'secs'
    for secs_bound, bound_unit in SECS_BOUND_WITH_UNIT:
        if time_elapsed >= secs_bound:
            time_elapsed /= secs_bound
            unit = bound_unit
            break
    return "{0:.2f} {1:s}".format(time_elapsed, unit)


class timethis:
    def __init__(self, message):
        self.message = message
        self.start_time = None

    def __enter__(self):
        self.start_time = datetime.now()
        return self

    def __exit__(self, exc_type, value, traceback):
        elapsed = (datetime.now() - self.start_time).total_seconds()
        print(self.message.format(makeSecondsPretty(elapsed)))
