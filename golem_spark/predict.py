def coef_at(*a, **k):
    raise NotImplementedError

def predict(*a, **k):
    raise NotImplementedError
