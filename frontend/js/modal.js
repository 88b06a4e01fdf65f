// Modal dialogs — reference parity for main/static/main/modal.js:3-40.
//
// Same surface as the reference Modal (open/close/add_contents/clear as
// openModal-style helpers) plus a promise-based text-input dialog that
// replaces window.prompt() (which blocks the event loop and is disabled
// in some embedded webviews).

export class Modal {
	constructor() {
		this.bg = document.createElement("div");
		this.bg.className = "modal-bg";
		this.body = document.createElement("div");
		this.body.className = "modal-body";
		this.bg.append(this.body);

		const close = document.createElement("button");
		close.textContent = "×";
		close.className = "modal-close";
		close.addEventListener("click", () => this.close());
		this.body.append(close);

		this.contents = document.createElement("div");
		this.body.append(this.contents);

		// click outside the body closes (the reference's background div
		// swallowed clicks; this is the one intentional refinement)
		this.bg.addEventListener("click", (ev) => {
			if (ev.target === this.bg) this.close();
		});

		document.body.append(this.bg);
		this.close();
	}

	addContents(el) {
		this.contents.append(el);
	}

	clear() {
		while (this.contents.firstChild) this.contents.firstChild.remove();
	}

	open() {
		this.bg.style.display = "";
	}

	close() {
		this.bg.style.display = "none";
		if (this.onClose) this.onClose();
	}
}

let shared = null;

/** Promise-based one-line text dialog: resolves the entered string, or
 * null on cancel/close. Drop-in for window.prompt(). */
export function modalInput(title, placeholder = "") {
	if (!shared) shared = new Modal();
	shared.clear();
	return new Promise((resolve) => {
		let settled = false;
		const done = (value) => {
			if (settled) return;
			settled = true;
			shared.onClose = null;
			shared.close();
			resolve(value);
		};
		shared.onClose = () => done(null);

		const label = document.createElement("p");
		label.textContent = title;
		const input = document.createElement("input");
		input.type = "text";
		input.placeholder = placeholder;
		input.addEventListener("keydown", (ev) => {
			if (ev.key === "Enter") done(input.value || null);
			if (ev.key === "Escape") done(null);
		});
		const ok = document.createElement("button");
		ok.textContent = "OK";
		ok.addEventListener("click", () => done(input.value || null));
		shared.addContents(label);
		shared.addContents(input);
		shared.addContents(ok);
		shared.open();
		input.focus();
	});
}
