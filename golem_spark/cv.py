class TrainedOwl:
    pass

def train_owl(*a, **k):
    raise NotImplementedError
