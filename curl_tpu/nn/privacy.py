"""Differentially-private split-model training (label-DP).

Parity scope: reference curl/nn/privacy/dp_split.py:62-549 (DPSplitModel).
The feature-holding party runs the forward pass in plaintext (torch), the
label-holding party contributes encrypted labels; the loss gradient w.r.t.
the logits is computed under MPC, parameter gradients are aggregated with DP
noise added *before* decryption, and plaintext backprop resumes from there.

Two gradient protocols (cfg.nn.dpsmpc.protocol):
  "full_jacobian"     — encrypt the full parameter Jacobian and compute all
                        parameter gradients under MPC.
  "layer_estimation"  — compute only dL/dW of the last linear layer under
                        MPC, decrypt with noise, and solve for dL/dZ to run
                        the rest of backprop in plaintext.
"""

from __future__ import annotations

import numpy as np

import curl_tpu
from ..config import cfg
from .loss import BCELoss, BCEWithLogitsLoss, CrossEntropyLoss, RAPPORLoss
from .module import Module


class DPSplitModel(Module):
    def __init__(self, pytorch_model, feature_src=0, label_src=1,
                 noise_magnitude=None, noise_src=None,
                 randomized_response_prob=None, rappor_prob=None):
        super().__init__()
        import torch

        self.noise_magnitude = noise_magnitude
        self.feature_src = feature_src
        self.label_src = label_src
        self.noise_src = noise_src
        self.model = pytorch_model
        if randomized_response_prob is not None:
            assert 0 < randomized_response_prob < 0.5
        self.rr_prob = randomized_response_prob
        if rappor_prob is not None:
            assert 0 <= rappor_prob <= 1
        self.alpha = rappor_prob
        self.preds = None
        self.logits = None
        self._np_rng = np.random.default_rng(0)

    @property
    def skip_loss_forward(self):
        return cfg.nn.dpsmpc.skip_loss_forward

    @property
    def protocol(self):
        return cfg.nn.dpsmpc.protocol

    def zero_grad(self):
        self.model.zero_grad()

    def forward(self, input):
        """Plaintext forward on the feature-holder's model; logits are then
        encrypted for the loss computation (dp_split.py:182)."""
        import torch

        if not torch.is_tensor(input):
            input = torch.tensor(np.asarray(input))
        self.logits_torch = self.model(input.float())
        self.logits = curl_tpu.cryptensor(
            self.logits_torch.detach().numpy(), src=self.feature_src
        )
        self.preds = self.logits.sigmoid()
        return self.logits

    def _process_targets(self, targets):
        """Randomized-response flip of labels if configured
        (dp_split.py:260)."""
        if curl_tpu.is_encrypted_tensor(targets):
            targets_enc = targets
        else:
            targets_enc = curl_tpu.cryptensor(
                np.asarray(targets, dtype=np.float64), src=self.label_src
            )
        if self.rr_prob is not None:
            flip = curl_tpu.bernoulli(
                np.full(tuple(targets_enc.shape), self.rr_prob)
            )
            targets_enc = targets_enc.add(flip).sub(
                targets_enc.mul(flip).mul(2)
            )
        return targets_enc

    def compute_loss(self, targets):
        """Encrypted BCE-with-logits loss; dL/dZ = preds - targets
        (dp_split.py:285)."""
        self.targets = self._process_targets(targets)
        if self.skip_loss_forward:
            self.loss = _SkippedLoss("loss forward skipped (see config)")
        else:
            if self.alpha is not None:
                self.loss = RAPPORLoss(self.alpha)(self.preds, self.targets)
            else:
                self.loss = BCELoss()(self.preds, self.targets)
        self.dLdZ = self.preds.sub(self.targets).div(
            self.preds.nelement()
        )
        return self.loss

    def _add_dp_if_necessary(self, grad):
        if self.noise_magnitude is None or self.noise_magnitude == 0.0:
            return grad
        noise = curl_tpu.randn(*tuple(grad.shape)).mul(self.noise_magnitude)
        return grad.add(noise)

    def _get_last_linear_layer(self):
        import torch

        layers = [m for m in self.model.modules() if isinstance(m, torch.nn.Linear)]
        return layers[-1]

    def _backward_layer_estimation(self):
        """dL/dW of the last linear layer under MPC -> +DP noise -> decrypt
        -> solve dL/dZ -> plaintext backprop (dp_split.py:486-533)."""
        import torch

        last = self._get_last_linear_layer()
        # input activations to the last layer, captured via forward hook
        x_in = self._last_input
        # dLdW = dLdZ^T @ x_in   (encrypted matmul)
        dLdW = self.dLdZ.transpose(0, 1).matmul(
            curl_tpu.cryptensor(x_in.detach().numpy(), src=self.feature_src)
        )
        dLdW = self._add_dp_if_necessary(dLdW)
        dLdW_plain = dLdW.get_plain_text()

        # solve dLdZ from dLdW = dLdZ^T @ X  =>  dLdZ = (dLdW @ pinv(X))^T
        # (dp_split.py:476 _solve_dLdZ)
        x_pinv = np.linalg.pinv(x_in.detach().numpy())  # (I, B)
        dLdZ_est = (dLdW_plain @ x_pinv).T              # (B, O)
        self.logits_torch.backward(
            torch.tensor(dLdZ_est.reshape(self.logits_torch.shape)).float()
        )

    def _backward_full_jacobian(self):
        """Encrypt per-parameter Jacobians, multiply by dL/dZ under MPC,
        decrypt noisy parameter grads (dp_split.py:369-474)."""
        import torch

        jacobians = {}
        for p in self.model.parameters():
            rows = []
            flat_logits = self.logits_torch.flatten()
            for i in range(flat_logits.numel()):
                g = torch.autograd.grad(
                    flat_logits[i], p, retain_graph=True, allow_unused=True
                )[0]
                rows.append(
                    np.zeros(p.shape).flatten() if g is None else g.numpy().flatten()
                )
            jacobians[p] = np.stack(rows)  # (Z, P)
        dLdZ_flat = self.dLdZ.flatten()
        for p, jac in jacobians.items():
            gp = dLdZ_flat.matmul(jac)
            gp = self._add_dp_if_necessary(gp)
            p.grad = __import__("torch").tensor(
                gp.get_plain_text().reshape(p.shape)
            ).float()

    def backward(self, grad_output=None):
        import torch

        if self.protocol == "full_jacobian":
            self._backward_full_jacobian()
        else:
            # capture last-linear input on the fly if not hooked
            if not hasattr(self, "_last_input"):
                raise RuntimeError(
                    "attach_hooks() must be called before forward for "
                    "layer_estimation protocol"
                )
            self._backward_layer_estimation()

    def attach_hooks(self):
        """Register a forward hook capturing the last linear layer input."""
        last = self._get_last_linear_layer()

        def hook(mod, inp, out):
            self._last_input = inp[0]

        last.register_forward_hook(hook)
        return self


class _SkippedLoss:
    """Placeholder when skip_loss_forward is set (dp_split.py:20)."""

    def __init__(self, msg=""):
        self.msg = msg

    def __repr__(self):
        return f"SkippedLoss({self.msg})"
