"""Hierarchical CSG scene graph.

Mirrors the reference's ``Component`` tree semantics
(reference: /root/reference/master/scenecompiler.py:261-394): a component is a
brush + material + intrinsic 4x4 transform + subtractive flag + children.
``fabricate`` instantiates a prefab under a new transform; transform
propagation multiplies intrinsics up the parent chain; ``get_commands``
compiles the tree into the flat register-machine tape.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional

import numpy as np

from .constants import OPCODE_VALUES


class ArgumentType(enum.Enum):
    IMMEDIATE = enum.auto()
    ALLOCATION = enum.auto()


@dataclasses.dataclass
class Argument:
    """A register, immediate, or null tape argument (scenecompiler.py:149-164)."""

    type: ArgumentType
    address: int

    @staticmethod
    def null() -> "Argument":
        return Argument(type=ArgumentType.IMMEDIATE, address=-1)

    @staticmethod
    def immediate(v: int) -> "Argument":
        return Argument(type=ArgumentType.IMMEDIATE, address=v)


@dataclasses.dataclass
class Command:
    """One scene-build instruction: ``opcode left right dest``."""

    command_code: str
    left_argument: Argument
    right_argument: Argument
    destination: Argument

    def __repr__(self):
        return "{} {} {} {}".format(
            self.command_code,
            self.left_argument.address,
            self.right_argument.address,
            self.destination.address,
        )

    def __str__(self):
        return "{} {} {} {}".format(
            OPCODE_VALUES[self.command_code],
            self.left_argument.address,
            self.right_argument.address,
            self.destination.address,
        )

    def as_tuple(self):
        return (
            OPCODE_VALUES[self.command_code],
            self.left_argument.address,
            self.right_argument.address,
            self.destination.address,
        )


class Incrementor:
    def __init__(self):
        self._count = 0

    def count(self):
        return self._count

    def preincremented(self):
        self._count += 1
        return self._count

    def postincremented(self):
        self._count += 1
        return self._count - 1


class Allocator:
    """Linear register allocator (scenecompiler.py:203-224): one register per
    internal tree node, plus scratch register R0."""

    def __init__(self):
        self.next_free_address = Incrementor()
        self.allocations = {}

    def allocate(self, name: Optional[str] = None) -> Argument:
        argument = Argument(
            type=ArgumentType.ALLOCATION,
            address=self.next_free_address.postincremented(),
        )
        if name is None:
            name = "ALLOC_{}".format(argument.address)
        self.allocations[name] = argument
        setattr(self, name, argument)
        return argument

    @property
    def num_registers(self) -> int:
        return self.next_free_address.count()


class Component:
    """A node in the CSG tree (scenecompiler.py:261-387).

    Any component can be treated as a prefab; ``fabricate`` clones it (and its
    subtree) under a new transform.
    """

    def __init__(self, brush, material, transform=None, subtractive=False):
        self.brush = brush
        self.material = material
        self.intrinsic_transform = (
            np.identity(4) if transform is None else np.asarray(transform, dtype=np.float64)
        )
        self.subtractive = bool(subtractive)
        self.propogated_transform = np.identity(4)
        self.children: List["Component"] = []
        self.parent: Optional["Component"] = None
        # Assigned at commit time:
        self.unrolled_index: Optional[int] = None
        self.variable: Optional[Argument] = None

    # -- tree building -----------------------------------------------------

    def add_child(self, child: "Component") -> "Component":
        self.children.append(child)
        child.parent = self
        return child

    def fabricate(self, transform=None, subtractive=None) -> "Component":
        """Clone this prefab under ``transform`` (scenecompiler.py:293-301).

        Unlike the reference (which always instantiates a plain ``Component``,
        silently dropping intersection join semantics on fabricated
        IntersectionComponents), the clone preserves the subclass.
        """
        sub = self.subtractive if subtractive is None else subtractive
        transform = np.identity(4) if transform is None else transform
        instance = type(self).__new__(type(self))
        Component.__init__(
            instance,
            brush=self.brush,
            material=self.material,
            transform=np.asarray(transform) @ self.intrinsic_transform,
            subtractive=sub,
        )
        for child in self.children:
            instance.add_child(child.fabricate(transform=np.identity(4)))
        return instance

    def apply_transform(self, transform):
        self.intrinsic_transform = np.asarray(transform) @ self.intrinsic_transform

    # -- transform propagation --------------------------------------------

    def propogate_transforms(self):
        """Walk the parent chain multiplying intrinsics (scenecompiler.py:303-309)."""
        self.propogated_transform = self.intrinsic_transform
        current = self
        while current.parent is not None:
            current = current.parent
            self.propogated_transform = (
                current.intrinsic_transform @ self.propogated_transform
            )

    def position(self):
        return (self.propogated_transform @ np.array([0.0, 0.0, 0.0, 1.0]))[0:3]

    def right(self):
        return self.propogated_transform[0:3, 0]

    def up(self):
        return self.propogated_transform[0:3, 1]

    def forward(self):
        return self.propogated_transform[0:3, 2]

    # -- flattening and tape compilation -----------------------------------

    def get_unrolled_components(self) -> List["Component"]:
        components = [self]
        for child in self.children:
            components.extend(child.get_unrolled_components())
        return components

    def _join_mode(self) -> str:
        return "MIN"

    def get_commands(self, allocator: Allocator) -> List[Command]:
        """Emit the register-machine program for this subtree
        (scenecompiler.py:353-387).

        The parent IMPORTs its own brush into its allocated register; each
        leaf child IMPORTs into scratch R0 then MIN (additive) or NEGATE+MAX
        (subtractive) folds into the parent register; a non-leaf child
        compiles recursively and its register folds into the parent.
        """
        join_mode = self._join_mode()
        commands: List[Command] = []
        if not self.children:
            return commands

        commands.append(
            Command(
                "IMPORT",
                Argument.immediate(self.brush.bank_index),
                Argument.immediate(self.unrolled_index),
                self.variable,
            )
        )
        for child in self.children:
            if not child.children:
                commands.append(
                    Command(
                        "IMPORT",
                        Argument.immediate(child.brush.bank_index),
                        Argument.immediate(child.unrolled_index),
                        allocator.R0,
                    )
                )
                if child.subtractive:
                    commands.append(
                        Command("NEGATE", allocator.R0, Argument.null(), allocator.R0)
                    )
                    commands.append(
                        Command("MAX", self.variable, allocator.R0, self.variable)
                    )
                else:
                    commands.append(
                        Command(join_mode, self.variable, allocator.R0, self.variable)
                    )
            else:
                commands.extend(child.get_commands(allocator))
                if child.subtractive:
                    commands.append(
                        Command("NEGATE", child.variable, Argument.null(), allocator.R0)
                    )
                    commands.append(
                        Command("MAX", self.variable, allocator.R0, self.variable)
                    )
                else:
                    commands.append(
                        Command(join_mode, self.variable, child.variable, self.variable)
                    )
        return commands


class IntersectionComponent(Component):
    """A component whose children combine by MAX (intersection); its own
    brush is the space brush (sdf == 0 everywhere), making the fold
    ``max(0, d_1, d_2, ...)`` exactly as the reference does
    (scenecompiler.py:389-394).  Note this clamps interior distances to 0 —
    a reference quirk we reproduce for parity."""

    def _join_mode(self) -> str:
        return "MAX"
