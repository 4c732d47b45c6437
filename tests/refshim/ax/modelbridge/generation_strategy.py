class GenerationStep:
    def __init__(self, *args, **kwargs):
        pass


class GenerationStrategy:
    def __init__(self, *args, **kwargs):
        pass
