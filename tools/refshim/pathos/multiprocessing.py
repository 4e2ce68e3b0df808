class ProcessingPool:
    """Serial drop-in for pathos.multiprocessing.ProcessingPool."""

    def __init__(self, *args, **kwargs):
        pass

    def map(self, f, *iterables):
        return [f(*xs) for xs in zip(*iterables)]

    def clear(self):
        pass

    def close(self):
        pass

    def join(self):
        pass

    def restart(self):
        pass
