"""Batch-of-one DataLoader: sufficient for the reference rollout driver
(test.py:238 uses shuffle=False, batch_size=1). Multi-graph collation is not
implemented — the parity/A-B harness never batches."""


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False, **kw):
        if batch_size != 1:
            raise NotImplementedError("pygshim DataLoader supports batch_size=1")
        if shuffle:
            raise NotImplementedError("pygshim DataLoader is order-preserving")
        self.dataset = dataset

    def __iter__(self):
        for i in range(len(self.dataset)):
            yield self.dataset[i]

    def __len__(self):
        return len(self.dataset)
