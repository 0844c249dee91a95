"""Quickstart: train a small MLP on a CSV dataset.

Python rendition of the reference's examples/quickstart.rs (same dataset,
same 3->5->5->1 architecture, same SGD+L2 recipe, model loaded from JSON)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import neuronika_tpu as nk
from neuronika_tpu import data, nn, optim, utils

CSV = (
    "Paw_size,Tail_length,Weight,Animal\n"
    "0.2,5.0,15.0,Dog\n"
    "0.08,12.0,4.0,Cat\n"
    "0.07,13.0,5.0,Cat\n"
    "0.05,3.0,0.8,Mouse"
)


class NeuralNetwork:
    def __init__(self):
        self.status = nn.ModelStatus.default()
        self.lin1 = self.status.register(nn.Linear(3, 5))
        self.lin2 = self.status.register(nn.Linear(5, 5))
        self.lin3 = self.status.register(nn.Linear(5, 1))

    def parameters(self):
        return self.status.parameters()

    def forward(self, input):
        out1 = self.lin1.forward(input).relu()
        out2 = self.lin2.forward(out1).relu()
        return self.lin3.forward(out2)


def main():
    # Data loader with label mapping (quickstart.rs:186-202)
    def mapper(pair):
        record, label = pair
        return record, [{"Dog": 1.0, "Cat": 2.0}.get(label, 3.0)]

    dataset = (
        data.DataLoader.default()
        .with_labels([3])
        .from_reader_fn(CSV, 3, 1, mapper)
    )

    # Save + reload the model as JSON (quickstart.rs:47-179)
    model = NeuralNetwork()
    blob = json.dumps(
        utils.state_dict(
            {"lin1": model.lin1, "lin2": model.lin2, "lin3": model.lin3}
        )
    )
    model = NeuralNetwork()
    utils.load_state_dict(
        {"lin1": model.lin1, "lin2": model.lin2, "lin3": model.lin3},
        json.loads(blob),
    )

    optimizer = optim.SGD(0.01, optim.L2(0.0))
    optimizer.register_all(model.parameters())

    for epoch in range(5):
        total_loss = 0.0
        for input_array, target_array in dataset.shuffle().batch(2).drop_last():
            input = nk.from_ndarray(input_array)
            target = nk.from_ndarray(target_array)
            result = model.forward(input)
            loss = nn.loss.mse_loss(result, target, nn.loss.Reduction.Mean)
            loss.forward()
            total_loss += loss.item()
            loss.backward(1.0)
            optimizer.step()
            optimizer.zero_grad()
        print(f"Loss for epoch {epoch} : {total_loss} ")


if __name__ == "__main__":
    main()
