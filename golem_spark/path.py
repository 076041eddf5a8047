class OwlFit:  # placeholder, real implementation lands next commit
    pass

def owl(*a, **k):
    raise NotImplementedError
